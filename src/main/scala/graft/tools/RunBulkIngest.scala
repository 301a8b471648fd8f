package graft.tools

import graft.GraftSession
import graft.ingest.{BulkIngest, Ingest}

/** Config-driven bulk ingest CLI — the reference's
  * `run_spark_ingest_bulk.sh:7-10` takes its feeds and month range from
  * env; same contract here:
  *
  *   GRAFT_BASE_URL    source base URL (e.g. the TLC CDN or a mirror)
  *   GRAFT_RAW_BASE    warehouse raw-layer base dir
  *   GRAFT_FEEDS       comma-separated, default "yellow,green,fhv,fhvhv"
  *   GRAFT_START       inclusive start month "YYYY-MM", default 2024-01
  *   GRAFT_END         inclusive end month   "YYYY-MM", default 2024-02
  *   GRAFT_MODE        "skip" (default) or "overwrite"
  *   GRAFT_RETRIES     per-month retries, default 2 (Airflow DAG policy)
  *
  * Usage: `runMain graft.tools.RunBulkIngest`.
  */
object RunBulkIngest {

  private def parseYm(s: String): (Int, Int) = s.split("-") match {
    case Array(y, m) => (y.toInt, m.toInt)
    case _ => throw new IllegalArgumentException(s"expected YYYY-MM, got '$s'")
  }

  def main(args: Array[String]): Unit = {
    val baseUrl = sys.env.getOrElse("GRAFT_BASE_URL",
      throw new IllegalArgumentException("GRAFT_BASE_URL is required"))
    val rawBase = sys.env.getOrElse("GRAFT_RAW_BASE",
      throw new IllegalArgumentException("GRAFT_RAW_BASE is required"))
    val feeds = sys.env.getOrElse("GRAFT_FEEDS", "yellow,green,fhv,fhvhv")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val (sy, sm) = parseYm(sys.env.getOrElse("GRAFT_START", "2024-01"))
    val (ey, em) = parseYm(sys.env.getOrElse("GRAFT_END", "2024-02"))
    val mode = sys.env.getOrElse("GRAFT_MODE", "skip") match {
      case "skip" => Ingest.Skip
      case "overwrite" => Ingest.Overwrite
      case other => throw new IllegalArgumentException(s"unknown GRAFT_MODE '$other'")
    }
    val retries = sys.env.getOrElse("GRAFT_RETRIES", "2").toInt

    val spark = GraftSession.local()
    try {
      val results = BulkIngest.run(spark, baseUrl, rawBase, feeds,
        BulkIngest.monthRange(sy, sm, ey, em), retries = retries, mode = mode)
      results.foreach { a =>
        val r = a.result
        println(s"[bulk] ${r.feed} ${r.year}-${r.month}: ${r.action} " +
          s"rows=${r.rows} attempts=${a.attempts}")
      }
      val rows = results.map(_.result.rows).sum
      println(s"[bulk] done: ${results.size} month-tasks, $rows rows ingested")
    } finally spark.stop()
  }
}
