package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.PathCatalog

/** Multi-session table identity: the warehouse-persisted path catalog
  * must resolve the same names from a FRESH handle (the second-session
  * re-open), survive re-registration, and reject unsafe identifiers. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("register/resolve/read round-trips across fresh handles") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pathcat").toString
    val loc = s"$wh/data/t1"
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v").write.parquet(loc)
    new PathCatalog(spark, wh).register("raw", "trips", loc)
    // fresh handle = a different session re-opening the same warehouse
    val reopened = new PathCatalog(spark, wh)
    assert(reopened.resolve("raw", "trips").contains((loc, "parquet")))
    assert(reopened.read("raw", "trips").count() == 10)
    assert(reopened.list("raw") == Seq("trips"))
    // last-writer-wins re-registration (ALTER TABLE SET LOCATION shape)
    val loc2 = s"$wh/data/t2"
    (1 to 3).map(i => (i.toLong, "x")).toDF("k", "v").write.parquet(loc2)
    new PathCatalog(spark, wh).register("raw", "trips", loc2)
    assert(reopened.read("raw", "trips").count() == 3)
    // external-table drop: name unbound, files stay
    reopened.drop("raw", "trips")
    assert(reopened.resolve("raw", "trips").isEmpty)
    assert(spark.read.parquet(loc).count() == 10)
  }

  test("unsafe identifiers are rejected before touching the filesystem") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pathcat2").toString
    val cat = new PathCatalog(spark, wh)
    intercept[IllegalArgumentException] { cat.register("a/b", "t", "/x") }
    intercept[IllegalArgumentException] { cat.register("ns", "..", "/x") }
    intercept[IllegalArgumentException] { cat.resolve("ns", "a.b") }
  }

  test("locations containing '=' round-trip; newline locations are rejected") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pathcat4").toString
    val cat = new PathCatalog(spark, wh)
    // '=' in a location (query-string-ish path) must survive the
    // first-'=' line split
    val loc = s"$wh/data/t%3Fv=1"
    cat.register("ns", "eq", loc)
    assert(cat.resolve("ns", "eq").contains((loc, "parquet")))
    intercept[IllegalArgumentException] {
      cat.register("ns", "bad", "a\nevil=/tmp")
    }
    intercept[IllegalArgumentException] {
      cat.register("ns", "bad", "/x", format = "par quet")
    }
  }

  test("missing table resolves to None and read fails loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pathcat3").toString
    val cat = new PathCatalog(spark, wh)
    assert(cat.resolve("nope", "missing").isEmpty)
    assert(cat.list("nope").isEmpty)
    intercept[RuntimeException] { cat.read("nope", "missing") }
  }
}
