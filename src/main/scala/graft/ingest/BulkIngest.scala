package graft.ingest

import java.nio.file.{Path, Paths}
import org.apache.spark.sql.SparkSession

/** Config-driven bulk ingest: the feeds × months loop of the reference's
  * `run_spark_ingest_bulk.sh:7-10` / `ingest_spark_bulk.py:171-216`, with
  * the Airflow DAG's retry policy applied per (feed, month) task
  * (`airflow/dags/nyc_taxi_pipeline.py:17-19`: retries=2, retry_delay
  * 5 min).
  *
  * Orchestration is deliberately driver-side and sequential per month —
  * each month is itself a distributed Spark job, and the reference's DAG
  * serializes them the same way. Failure semantics match Airflow's: a
  * month that still fails after `retries` re-attempts aborts the run
  * loudly; a 404 month is skip-as-success and consumes no retries.
  */
object BulkIngest {

  /** One month's outcome plus how many attempts it took. */
  final case class Attempted(result: Ingest.Result, attempts: Int)

  /** Inclusive calendar range as (year, month) pairs. */
  def monthRange(startYear: Int, startMonth: Int,
                 endYear: Int, endMonth: Int): Seq[(Int, Int)] = {
    require(startYear * 100 + startMonth <= endYear * 100 + endMonth,
      "start month must not be after end month")
    for {
      y <- startYear to endYear
      m <- 1 to 12
      if (y > startYear || m >= startMonth) && (y < endYear || m <= endMonth)
    } yield (y, m)
  }

  /** Per-feed raw table location under the warehouse base — the
    * reference's one-Iceberg-table-per-feed layout. */
  def rawTablePath(rawBase: String, feed: String): String = s"$rawBase/raw_$feed"

  /** Fetch + ingest every (feed, month), retrying each failed month up to
    * `retries` times with `retryDelayMs` between attempts. Returns one
    * [[Attempted]] per (feed, month) in iteration order; throws after the
    * final retry of a month is exhausted (partial results up to that
    * month are already durably written — rerunning in `Skip` mode resumes
    * idempotently past them, exactly like re-triggering the DAG). */
  def run(spark: SparkSession, baseUrl: String, rawBase: String,
          feeds: Seq[String], months: Seq[(Int, Int)],
          retries: Int = 2, retryDelayMs: Long = 300000L,
          mode: Ingest.Mode = Ingest.Skip,
          workDir: Path = Paths.get(sys.props("java.io.tmpdir"))): Seq[Attempted] =
    for {
      feed <- feeds
      (year, month) <- months
    } yield {
      var attempts = 0
      var out: Option[Ingest.Result] = None
      var last: Throwable = null
      while (out.isEmpty && attempts <= retries) {
        if (attempts > 0 && retryDelayMs > 0) Thread.sleep(retryDelayMs)
        attempts += 1
        try out = Some(HttpFetch.fetchAndIngest(spark, baseUrl,
          rawTablePath(rawBase, feed), feed, year, month, workDir, mode))
        catch { case e: Exception => last = e }
      }
      out match {
        case Some(r) => Attempted(r, attempts)
        case None => throw new RuntimeException(
          s"bulk ingest: $feed $year-$month failed after $attempts attempts", last)
      }
    }
}
