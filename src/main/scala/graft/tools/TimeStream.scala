package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, SparkEntry}

/** Phase-splits a streaming graded entry's cost (round 17): the
  * `taxi_stream_*` entries spend 4-7 s each in the committed bench,
  * attributed (round 15) to "trigger waits". This separates
  *
  *  - the foreachBatch WORK — the same per-batch snapshot commits
  *    applied directly, no streaming query around them — from
  *  - Structured Streaming MACHINERY (query start/stop, offset +
  *    commit WAL writes, batch planning, the execution thread
  *    handoff), measured both as the work-vs-stream delta and
  *    directly by an empty-source streaming query (zero data rows:
  *    the pure-machinery floor).
  *
  * Run: `sbt "runMain graft.tools.TimeStream"` (sf0.1, local[32]);
  * iteration 2 is the warm/steady-state reading. Findings land in
  * `bench_history/README.md`. */
object TimeStream {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[timestream] $label: $s%.2f s"); s
    }
    val base = java.nio.file.Files.createTempDirectory("timestream").toString
    // a changelog-shaped input at sf0.1 scale, two parquet files → two
    // micro-batches (the graded taxi_stream_ivm shape: maxFilesPerTrigger=1)
    val stg = SparkEntry.queries("taxi_stg_yellow")(spark, d)
      .select(col("year"), col("month"), col("fare_amount"))
      .withColumn("op", lit("insert"))
    val logDir = s"$base/log"
    stg.repartition(2).write.parquet(logDir)
    val logSchema = spark.read.parquet(logDir).schema
    val files = new java.io.File(logDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    def seeded(path: String): graft.write.SnapshotTable = {
      val t = new graft.write.SnapshotTable(spark, path)
      t.commitOverwrite(stg.groupBy(col("year"), col("month"))
        .agg(count(lit(1)).as("n"),
          graft.expr.Functions.stableSum(col("fare_amount")).as("fs")))
      t
    }
    (1 to 2).foreach { k =>
      // A: the streaming form, exactly the graded entry's shape
      val aggS = seeded(s"$base/aggS$k")
      val a = time(s"iter $k: ivmStream (2 micro-batches)") {
        graft.streaming.StreamingEvents.ivmStream(
          spark.readStream.schema(logSchema)
            .option("maxFilesPerTrigger", 1).parquet(logDir),
          aggS, Seq("year", "month"), "n", "fs", "fare_amount",
          s"$base/ckptS$k").awaitTermination()
      }
      // B: the same WORK with no streaming query around it — one
      // ivmApplyBatch per file, same commits, same table shape
      val aggB = seeded(s"$base/aggB$k")
      val b = time(s"iter $k: direct ivmApplyBatch x${files.length}") {
        files.zipWithIndex.foreach { case (f, i) =>
          graft.streaming.StreamingEvents.ivmApplyBatch(
            aggB, spark.read.schema(logSchema).parquet(f), i.toLong,
            Seq("year", "month"), "n", "fs", "fare_amount")
          ()
        }
      }
      // C: machinery floor — an empty source through the same query
      // shape. The empty-dir WRITE is setup (a full Spark write job),
      // not machinery, so it stays outside the timed closure like
      // seeded() does for A and B.
      val emptyDir = s"$base/empty$k"
      stg.limit(0).write.parquet(emptyDir)
      val c = time(s"iter $k: empty-source stream (pure machinery)") {
        spark.readStream.schema(logSchema).parquet(emptyDir)
          .writeStream.foreachBatch {
            (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) => { mb.count(); () } }
          .option("checkpointLocation", s"$base/ckptE$k")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      println(f"[timestream] iter $k: stream-minus-work delta = " +
        f"${a - b}%.2f s, empty-source floor = $c%.2f s")
    }
    spark.stop()
  }
}
