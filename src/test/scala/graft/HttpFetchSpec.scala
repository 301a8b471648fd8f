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
