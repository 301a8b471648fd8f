package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

/** S1: HTTP source fetch — the reference downloads each monthly parquet
  * from the TLC CDN with a 300 s timeout and treats 404 as skip-as-success
  * (a month not yet published is not an error):
  * `/root/reference/scripts/nyc_taxi/ingest_spark_bulk.py:87-115,165-168`.
  *
  * The fetch is driver-side by necessity (one small file per month); the
  * downloaded file is handed to [[Ingest.ingestMonth]], whose executors
  * read it directly — there is no object-store staging hop (the
  * reference's S2) because Spark's reader pulls from any Hadoop FS URI.
  */
object HttpFetch {

  sealed trait FetchResult
  final case class Fetched(path: Path, bytes: Long) extends FetchResult
  case object NotFound extends FetchResult
  final case class Failed(status: Int) extends FetchResult

  val DefaultTimeout: Duration = Duration.ofSeconds(300)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  /** GET `url` into `destDir/fileName`. 404 ⇒ [[NotFound]] (caller skips
    * the month as the reference does); other non-2xx ⇒ [[Failed]]. */
  def fetch(url: String, destDir: Path, fileName: String,
            timeout: Duration = DefaultTimeout): FetchResult = {
    Files.createDirectories(destDir)
    val dest = destDir.resolve(fileName)
    val req = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET().build()
    // TRUNCATE_EXISTING: without it a shorter download over a stale file
    // (crashed previous run) keeps the old tail bytes → corrupt parquet.
    val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(dest,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 => Fetched(dest, Files.size(dest))
      case 404 => Files.deleteIfExists(dest); NotFound
      case other => Files.deleteIfExists(dest); Failed(other)
    }
  }

  /** The reference's CDN naming scheme (`ingest_spark_bulk.py:88`):
    * `{feed}_tripdata_{year}-{month:02d}.parquet`. */
  def monthlyFileName(feed: String, year: Int, month: Int): String =
    f"${feed}_tripdata_$year-$month%02d.parquet"

  /** Fetch one monthly file and ingest it; 404 maps to the ingest-level
    * skip-as-success result. */
  def fetchAndIngest(spark: org.apache.spark.sql.SparkSession, baseUrl: String,
                     rawTablePath: String, feed: String, year: Int, month: Int,
                     workDir: Path = Paths.get(sys.props("java.io.tmpdir")),
                     mode: Ingest.Mode = Ingest.Skip): Ingest.Result = {
    val name = monthlyFileName(feed, year, month)
    fetch(s"$baseUrl/$name", workDir, name) match {
      case Fetched(path, _) =>
        try Ingest.ingestMonth(spark, path.toString, rawTablePath, feed, year, month, mode)
        finally Files.deleteIfExists(path)
      case NotFound => Ingest.Result(feed, year, month, "skipped_missing_source", 0L)
      case Failed(status) =>
        throw new RuntimeException(s"fetch $name failed with HTTP $status")
    }
  }
}
