package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}

/** Measurement tool behind the round-16 clone-fixture switch
  * (bench_history/README.md): phase-splits a snapshot-entry execution
  * into fixture build, deepClone vs shallowClone, the merge commit on
  * each, and the read-back — the numbers that justified moving the
  * mutation entries' fixtures to zero-copy clones. Run:
  * `sbt "runMain graft.tools.TimeClone"` (sf0.1, local[32]); second
  * iteration is the warm/steady-state reading. */
object TimeClone {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[timeclone] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val stg = SparkEntry.queries("taxi_stg_yellow")(spark, d)
    val base = java.nio.file.Files.createTempDirectory("timeclone").toString
    val t = new graft.write.SnapshotTable(spark, s"$base/src")
    time("fixture: overwrite + partial overwrite + rollback") {
      val v1 = t.commitOverwrite(stg)
      t.commitOverwritePartitions(stg.filter(col("month").isin(6, 7))
        .withColumn("fare_amount", col("fare_amount") * -100))
      t.rollbackTo(v1)
    }
    (1 to 2).foreach { k =>
      val dc = time(s"deepClone $k")(t.deepClone(s"$base/deep$k"))
      val sc = time(s"shallowClone $k")(t.shallowClone(s"$base/shallow$k"))
      val batch = stg.filter(col("month").isin(6, 7))
        .withColumn("fare_amount", col("fare_amount") * 2)
      time(s"commitMerge on deep $k")(dc.commitMerge(batch, Seq("trip_id")))
      time(s"commitMerge on shallow $k")(sc.commitMerge(batch, Seq("trip_id")))
      time(s"read-agg deep $k")(dc.read().groupBy(col("year"), col("month"))
        .agg(count(lit(1))).collect())
      time(s"read-agg shallow $k")(sc.read().groupBy(col("year"), col("month"))
        .agg(count(lit(1))).collect())
    }
    spark.stop()
  }
}
