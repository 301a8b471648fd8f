package graft

import org.apache.spark.sql.SparkSession

/** Developer utility: run ONE named entry (repeatably) with timing and
  * an optional formatted plan dump — the profiling loop for chasing a
  * single query's regression without paying a full bench pass.
  *
  * Usage: `sbt "runMain graft.RunOne <entry> [reps] [explain]"` with
  * `SPARK_GRAFT_SF_DIR` selecting the scale factor (defaults to sf0.01).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <entry> [reps] [explain]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val explain = args.contains("explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions) // SQL time travel + DML rules (build-time only)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"no such entry: $name (${SparkEntry.queries.size} known)"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain && i == 1) df.explain("formatted")
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[runone] $name rep $i: $dt%.3f s")
      TransientCache.drain()
    }
    spark.stop()
  }
}
