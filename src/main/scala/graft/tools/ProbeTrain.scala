package graft.tools

import graft.{GraftSession, SparkEntry, TransientCache}

/** Validation tool for the bench environment-inflation instrument
  * (bench_history/README.md, round 16): interleaves the bench's exact
  * cpuProbe (and a 10x-bigger, overhead-insensitive twin) with the
  * full entry workload at sf0.1. A flat train rules out the two
  * false-positive mechanisms the inflation stamp could have had —
  * session aging of the tiny probe job, and a start-probe warm-up
  * artifact — so an elevated mid-run profile in a real bench measures
  * genuine machine contention. Run:
  * `sbt "runMain graft.tools.ProbeTrain"`. */
object ProbeTrain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
    def probe(rows: Long): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, rows, 1L, 8)
        .select(sum(pmod(xxhash64(col("id")), lit(1000L)))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    graft.entries.TaxiEntries.prewarmSharedFixtures(spark, d)
    graft.entries.DataPipelineEntries.prewarmSharedFixtures(spark, d)
    probe(20000000L); probe(200000000L)
    val s0 = probe(20000000L); val b0 = probe(200000000L)
    println(f"[probetrain] start: small $s0%.3f s  big $b0%.3f s")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.grouped(40).zipWithIndex.foreach { case (batch, gi) =>
      batch.foreach { n =>
        try SparkEntry.queries(n)(spark, d).write.format("noop")
          .mode("overwrite").save()
        catch { case _: Throwable => () }
        TransientCache.drain()
      }
      val s = probe(20000000L); val b = probe(200000000L)
      println(f"[probetrain] after ${(gi + 1) * 40}%3d entries: small $s%.3f s (${s / s0}%.2fx)  big $b%.3f s (${b / b0}%.2fx)")
    }
    spark.stop()
  }
}
