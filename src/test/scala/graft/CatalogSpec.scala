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

  test("racing re-registrations never unbind the name for a concurrent reader") {
    // the delete-then-rename implementation opened a window where
    // resolve() observed "no such table" mid-re-register; the
    // overwrite-rename flip must never show that window, and racing
    // writers (each with a unique temp file) must always leave ONE
    // intact winner
    val wh = java.nio.file.Files.createTempDirectory("graft_pathcat5").toString
    val cat = new PathCatalog(spark, wh)
    cat.register("ns", "hot", "/loc/0")
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    val corrupt = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        val c = new PathCatalog(spark, wh)
        try while (!stop.get()) c.resolve("ns", "hot") match {
          case None => misses.incrementAndGet()
          case Some((loc, _)) if !loc.startsWith("/loc/") => corrupt.add(loc)
          case _ => ()
        } catch { case e: Throwable => corrupt.add(s"reader died: $e") }
      })
    }
    val writers = (1 to 2).map { w =>
      new Thread(() => {
        var i = 0
        try while (!stop.get()) { cat.register("ns", "hot", s"/loc/$w$i"); i += 1 }
        catch { case e: Throwable => corrupt.add(s"writer died: $e") }
      })
    }
    (readers ++ writers).foreach(_.start())
    Thread.sleep(1500)
    stop.set(true)
    (readers ++ writers).foreach(_.join(10000))
    assert(misses.get() == 0, s"resolve saw a missing entry ${misses.get()} times")
    assert(corrupt.isEmpty, s"resolve saw torn entries: $corrupt")
    assert(cat.resolve("ns", "hot").exists(_._1.startsWith("/loc/")))
  }

  test("missing table resolves to None and read fails loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pathcat3").toString
    val cat = new PathCatalog(spark, wh)
    assert(cat.resolve("nope", "missing").isEmpty)
    assert(cat.list("nope").isEmpty)
    intercept[RuntimeException] { cat.read("nope", "missing") }
  }
}
