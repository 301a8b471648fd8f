package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.HttpFetch

/** S1 semantics against a local stub server: 200 fetches bytes, 404 maps
  * to skip-as-success, other statuses fail loudly (reference
  * `ingest_spark_bulk.py:87-115,165-168`). */
class HttpFetchSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, Either[Int, Array[Byte]]])(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    routes.foreach { case (path, resp) =>
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = resp match {
          case Right(bytes) =>
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes); ex.close()
          case Left(status) =>
            ex.sendResponseHeaders(status, -1); ex.close()
        }
      })
    }
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetch 200 downloads the body; 404 is NotFound; 500 is Failed") {
    val body = "parquet-bytes".getBytes
    withServer(Map(
      "/ok.parquet" -> Right(body),
      "/missing.parquet" -> Left(404),
      "/broken.parquet" -> Left(500))) { base =>
      val dir = Files.createTempDirectory("graft_http")
      HttpFetch.fetch(s"$base/ok.parquet", dir, "ok.parquet") match {
        case HttpFetch.Fetched(p, n) =>
          assert(n == body.length && Files.readAllBytes(p).sameElements(body))
        case other => fail(s"expected Fetched, got $other")
      }
      assert(HttpFetch.fetch(s"$base/missing.parquet", dir, "m.parquet") == HttpFetch.NotFound)
      assert(!Files.exists(dir.resolve("m.parquet")))
      assert(HttpFetch.fetch(s"$base/broken.parquet", dir, "b.parquet") == HttpFetch.Failed(500))
    }
  }

  test("bulk ingest retries flaky months, skips 404s, aborts on exhaustion") {
    import graft.ingest.{BulkIngest, Ingest}
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_bulk_wh").toString
    val src = Files.createTempDirectory("graft_bulk_src")
    TaxiFixturesData.rawYellow(spark).filter(col("month") === 1)
      .drop("year", "month", "loaded_at")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/y.parquet")
    val parquetFile = Files.list(src.resolve("y.parquet")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(parquetFile))

    // month 1: fails once (500) then serves — must succeed on attempt 2
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/yellow_tripdata_2024-01.parquet", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        if (hits.incrementAndGet() == 1) { ex.sendResponseHeaders(500, -1); ex.close() }
        else { ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes); ex.close() }
    })
    // month 2: permanently missing (404 ⇒ skip-as-success, no retries)
    server.createContext("/yellow_tripdata_2024-02.parquet", new HttpHandler {
      def handle(ex: HttpExchange): Unit = { ex.sendResponseHeaders(404, -1); ex.close() }
    })
    // month 3: permanently broken (500 ⇒ abort after retries exhausted)
    server.createContext("/yellow_tripdata_2024-03.parquet", new HttpHandler {
      def handle(ex: HttpExchange): Unit = { ex.sendResponseHeaders(500, -1); ex.close() }
    })
    server.start()
    try {
      val base = s"http://localhost:${server.getAddress.getPort}"
      val got = BulkIngest.run(spark, base, wh, Seq("yellow"),
        BulkIngest.monthRange(2024, 1, 2024, 2), retries = 2, retryDelayMs = 1)
      assert(got.map(a => (a.result.action, a.attempts)) ==
        Seq(("appended", 2), ("skipped_missing_source", 1)))
      assert(spark.read.parquet(BulkIngest.rawTablePath(wh, "yellow")).count() ==
        got.head.result.rows)
      // re-run is idempotent: both months resolve in one attempt, no dup rows
      val again = BulkIngest.run(spark, base, wh, Seq("yellow"),
        BulkIngest.monthRange(2024, 1, 2024, 2), retries = 2, retryDelayMs = 1)
      assert(again.map(a => (a.result.action, a.attempts)) ==
        Seq(("skipped_existing", 1), ("skipped_missing_source", 1)))
      val boom = intercept[RuntimeException] {
        BulkIngest.run(spark, base, wh, Seq("yellow"), Seq((2024, 3)),
          retries = 2, retryDelayMs = 1)
      }
      assert(boom.getMessage.contains("failed after 3 attempts"))
    } finally server.stop(0)
  }

  test("fetchAndIngest: 404 month is skip-as-success; 200 month ingests") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val wh = Files.createTempDirectory("graft_http_wh").toString
    // serve a real one-month parquet file
    val src = Files.createTempDirectory("graft_http_src")
    TaxiFixturesData.rawYellow(spark).filter(col("month") === 1)
      .drop("year", "month", "loaded_at")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/y.parquet")
    val parquetFile = Files.list(src.resolve("y.parquet")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(parquetFile))

    withServer(Map(
      "/yellow_tripdata_2024-01.parquet" -> Right(bytes),
      "/yellow_tripdata_2024-02.parquet" -> Left(404))) { base =>
      val r1 = HttpFetch.fetchAndIngest(spark, base, s"$wh/raw_yellow", "yellow", 2024, 1)
      assert(r1.action == "appended" && r1.rows > 0)
      val r2 = HttpFetch.fetchAndIngest(spark, base, s"$wh/raw_yellow", "yellow", 2024, 2)
      assert(r2.action == "skipped_missing_source" && r2.rows == 0)
      assert(spark.read.parquet(s"$wh/raw_yellow").count() == r1.rows)
    }
  }
}
