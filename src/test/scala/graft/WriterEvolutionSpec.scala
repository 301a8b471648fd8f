package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.IncrementalWriter

/** Schema-drift behavior of deleteInsert — the reference's
  * `on_schema_change='append_new_columns'` (`stg_nyc_taxi__yellow_trips
  * .sql:5`) plus the single-action incrementalCut. */
class WriterEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deleteInsert appends new batch columns, nulls for history") {
    val path = Files.createTempDirectory("graft_evo").toString + "/t"
    val t0 = Seq(("k1", 1.0, 2024, 1), ("k2", 2.0, 2024, 1), ("k3", 3.0, 2024, 2))
      .toDF("trip_id", "fare", "year", "month")
    IncrementalWriter.deleteInsert(spark, t0, path, "trip_id")
    // batch replaces k2, adds a new column, touches only month 1
    val batch = Seq(("k2", 20.0, "extra", 2024, 1))
      .toDF("trip_id", "fare", "surcharge_note", "year", "month")
    IncrementalWriter.deleteInsert(spark, batch, path, "trip_id")
    val got = spark.read.option("mergeSchema", "true").parquet(path)
    assert(got.columns.toSet ==
      Set("trip_id", "fare", "surcharge_note", "year", "month"))
    val byKey = got.collect().map(r =>
      r.getString(r.fieldIndex("trip_id")) ->
        (r.getDouble(r.fieldIndex("fare")),
          Option(r.get(r.fieldIndex("surcharge_note"))))).toMap
    assert(byKey("k2") == ((20.0, Some("extra"))))
    assert(byKey("k1") == ((1.0, None)))   // survivor in rewritten partition
    assert(byKey("k3") == ((3.0, None)))   // untouched partition
  }

  test("deleteInsert pads columns the batch dropped with nulls") {
    val path = Files.createTempDirectory("graft_evo2").toString + "/t"
    val t0 = Seq(("k1", 1.0, "keep", 2024, 1))
      .toDF("trip_id", "fare", "legacy_col", "year", "month")
    IncrementalWriter.deleteInsert(spark, t0, path, "trip_id")
    val batch = Seq(("k2", 2.0, 2024, 1)).toDF("trip_id", "fare", "year", "month")
    IncrementalWriter.deleteInsert(spark, batch, path, "trip_id")
    val got = spark.read.option("mergeSchema", "true").parquet(path)
    val k2 = got.filter($"trip_id" === "k2").head()
    assert(k2.isNullAt(k2.fieldIndex("legacy_col")))
    assert(got.count() == 2)
  }

  test("raw append tolerates schema drift across months (accept-any-schema)") {
    val base = Files.createTempDirectory("graft_drift")
    val raw = s"$base/raw"
    Seq(("t1", 1.0)).toDF("id", "fare")
      .write.parquet(s"$base/m1.parquet")
    Seq(("t2", 2.0, "card")).toDF("id", "fare", "payment_kind")
      .write.parquet(s"$base/m2.parquet")
    import graft.ingest.Ingest
    assert(Ingest.ingestMonth(spark, s"$base/m1.parquet", raw, "yellow", 2024, 1).rows == 1)
    assert(Ingest.ingestMonth(spark, s"$base/m2.parquet", raw, "yellow", 2024, 2).rows == 1)
    val got = IncrementalWriter.readMerged(spark, raw)
    assert(got.columns.contains("payment_kind"))
    // plain read would pick one footer's schema — readMerged is the
    // documented reader contract for append-evolved raw tables
    val m1 = got.filter($"year" === 2024 && $"month" === 1).head()
    assert(m1.isNullAt(m1.fieldIndex("payment_kind")))
  }

  test("freshnessDays reports age of max(loaded_at); None when empty") {
    val now = System.currentTimeMillis()
    val df = Seq(
      new java.sql.Timestamp(now - 5 * 86400000L),
      new java.sql.Timestamp(now - 3 * 86400000L)).toDF("loaded_at")
    val age = IncrementalWriter.freshnessDays(df).get
    assert(age >= 2.9 && age <= 3.1, s"expected ~3 days, got $age")
    val empty = Seq.empty[java.sql.Timestamp].toDF("loaded_at")
    assert(IncrementalWriter.freshnessDays(empty).isEmpty)
  }

  test("freshnessStatus classifies pass/warn/error at the declared thresholds") {
    val now = System.currentTimeMillis()
    def at(daysOld: Double) =
      Seq(new java.sql.Timestamp(now - (daysOld * 86400000L).toLong)).toDF("loaded_at")
    assert(IncrementalWriter.freshnessStatus(at(1.0)) == "pass")
    assert(IncrementalWriter.freshnessStatus(at(3.0)) == "warn")
    assert(IncrementalWriter.freshnessStatus(at(6.0)) == "error")
    // an empty source has no freshness evidence at all ⇒ error
    assert(IncrementalWriter.freshnessStatus(
      Seq.empty[java.sql.Timestamp].toDF("loaded_at")) == "error")
  }

  test("incrementalCut single-action max(struct) picks calendar max") {
    val path = Files.createTempDirectory("graft_cut").toString + "/t"
    Seq(("a", 2023, 12), ("b", 2024, 1), ("c", 2024, 3))
      .toDF("k", "year", "month")
      .write.partitionBy("year", "month").parquet(path)
    val src = Seq(("x", 2024, 2), ("y", 2024, 3), ("z", 2024, 4), ("w", 2023, 11))
      .toDF("k", "year", "month")
    val cut = IncrementalWriter.incrementalCut(spark, src, path)
    assert(cut.select("k").as[String].collect().toSet == Set("y", "z"))
  }
}
