package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.write.{FileConditionalStore, GraftStores, JdbcConditionalStore, SnapshotTable}

/** Durable ConditionalStore implementations: the CAS-mode arbiters that
  * survive JVM restart. The contract tests run the raw get/putIf
  * semantics; the table tests prove the round-14/15 CAS investment can
  * hold real data — commit + tag through a durable store, drop every
  * handle, re-open cold, and the table is all there. */
class DurableStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(rows: (Int, Int, Int, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "year", "month", "fare")
  }

  private def state(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.select("id").collect().map(_.getInt(0)).toSet

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private def fileStore(dir: String): FileConditionalStore =
    FileConditionalStore.open(dir)

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- FileConditionalStore: contract ----

  test("file store: putIf contract — absent create, conditional swap, stale expected refused") {
    val dir = tmpDir("fcs_contract")
    val s = fileStore(s"$dir/cell")
    assert(s.get().isEmpty)
    // expected=Some over an absent cell refuses
    assert(!s.putIf(Some("x"), "y"))
    // first write: expected=None
    assert(s.putIf(None, "v1"))
    assert(s.get().contains("v1"))
    // a second expected=None refuses (cell now exists)
    assert(!s.putIf(None, "other"))
    // conditional swap with the right expected wins; stale loses
    assert(s.putIf(Some("v1"), "v2"))
    assert(!s.putIf(Some("v1"), "v3"), "stale expected must refuse")
    assert(s.get().contains("v2"))
    // multi-line values round-trip exactly (the pointer value is one)
    val multi = "3|v00003_ab.txt\nref=tag/x|1\nref=branch/b|2|bv_b.txt"
    assert(s.putIf(Some("v2"), multi))
    assert(s.get().contains(multi))
  }

  test("file store: N threads racing the same expected — exactly one winner per round") {
    val s = fileStore(s"${tmpDir("fcs_race")}/cell")
    assert(s.putIf(None, "0"))
    // 8 threads each try to advance 0->1->...->20 with CAS-retry; every
    // increment must have exactly one winner, so the final value is
    // exactly the number of successful putIfs
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        var done = false
        while (!done) {
          val cur = s.get().get
          if (cur.toInt >= 20) done = true
          else if (s.putIf(Some(cur), (cur.toInt + 1).toString))
            wins.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(s.get().contains("20"))
    assert(wins.get() == 20,
      s"double winner: ${wins.get()} successful CASes for 20 increments")
  }

  test("file store: generation GC keeps a bounded window and sweeps staging debris") {
    val dir = s"${tmpDir("fcs_gc")}/cell"
    // age floor 0: this test pins the COUNT bound; the floor (its own
    // tests below) would keep every young file alive
    val s = new FileConditionalStore(fs(dir), new Path(dir), gcAgeFloorMs = 0L)
    assert(s.putIf(None, "v1"))
    (2 to 20).foreach(i => assert(s.putIf(Some(s"v${i - 1}"), s"v$i")))
    assert(s.get().contains("v20"))
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    val gens = files.filter(_.matches("gen_\\d{12}\\.val"))
    assert(gens.size <= FileConditionalStore.KeepGenerations + 1,
      s"GC did not bound generations (head + KeepGenerations behind): $gens")
    assert(gens.max.contains("000000000020"), "head generation must survive")
    // two INDEPENDENT handles on the dir share the arbitration
    val s2 = fileStore(dir)
    assert(s2.get().contains("v20"))
    assert(!s2.putIf(Some("v19"), "x"))
    assert(s2.putIf(Some("v20"), "v21"))
    assert(s.get().contains("v21"), "first handle must see the second's put")
  }

  test("file store: GC age floor keeps young generations regardless of head distance") {
    val dir = s"${tmpDir("fcs_floor")}/cell"
    val s = fileStore(dir) // defaults: KeepGenerations=8, 10-minute floor
    assert(s.putIf(None, "v1"))
    (2 to 20).foreach(i => assert(s.putIf(Some(s"v${i - 1}"), s"v$i")))
    val gens = new java.io.File(dir).listFiles().map(_.getName)
      .count(_.matches("gen_\\d{12,}\\.val"))
    assert(gens == 20,
      s"age floor must protect all 20 fresh generations, found $gens — " +
        "a swept young name is exactly the recreatable slot a stalled " +
        "writer could lose a commit on")
  }

  test("file store: the age floor yields to the gcMaxRetained cap on a hot cell") {
    val dir = s"${tmpDir("fcs_cap")}/cell"
    // floor 1 h (nothing ages out in-test), cap 8: a hot cell must not
    // accumulate commits-per-floor-window files — past the cap the
    // sweep proceeds regardless of age (the post-win head check keeps
    // the lost-commit guard sound even then)
    val s = new FileConditionalStore(fs(dir), new Path(dir),
      keepGenerations = 2, gcAgeFloorMs = 3600L * 1000, gcMaxRetained = 8)
    assert(s.putIf(None, "v1"))
    (2 to 30).foreach(i => assert(s.putIf(Some(s"v${i - 1}"), s"v$i")))
    assert(s.get().contains("v30"))
    val gens = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.matches("gen_\\d{12,}\\.val")).sorted.toSeq
    assert(gens.size <= 9, // head .. head-gcMaxRetained+1, +1 slack
      s"cap did not bound young generations: ${gens.size} retained")
    assert(gens.last.contains("000000000030"), "head must survive")
    assert(gens.head >= "gen_000000000022.val",
      s"a generation past the cap survived: ${gens.head}")
  }

  test("file store: a writer stalled past the GC window raises instead of silently losing its commit") {
    // the ABA false-success: writer reads head G, stalls while the cell
    // advances past the retention window (gen_{G+1} created AND GC'd),
    // then wins create-exclusive on the RECREATED name — pre-guard,
    // putIf returned true for a value no reader would ever serve. The
    // beforeCreate seam makes the stall deterministic.
    val dir = s"${tmpDir("fcs_stall")}/cell"
    val p = new Path(dir)
    val hfs = fs(dir)
    val fast = new FileConditionalStore(hfs, p, keepGenerations = 2,
      gcAgeFloorMs = 0L)
    assert(fast.putIf(None, "v1"))
    @volatile var stalledOnce = false
    val slow = new FileConditionalStore(hfs, p, keepGenerations = 2,
      gcAgeFloorMs = 0L) {
      override protected def beforeCreate(next: Long): Unit =
        if (!stalledOnce) {
          stalledOnce = true
          // the "stall": 8 commits land through the fast handle — head
          // moves to 9, GC (keep=2, floor 0) recreates room at gen_2
          (2 to 9).foreach(i => assert(fast.putIf(Some(s"v${i - 1}"), s"v$i")))
        }
    }
    val e = intercept[RuntimeException] { slow.putIf(Some("v1"), "lost") }
    assert(e.getMessage.contains("stalled past"), e.getMessage)
    assert(fast.get().contains("v9"), "live head must be unaffected")
    assert(slow.get().contains("v9"),
      "the stale value must never be served — not even by its writer")
    // the orphan generation was deleted, not left as served-looking debris
    val lostBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("gen_\\d{12,}\\.val"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    assert(!lostBytes.contains("lost"), "orphan value left on disk")
  }

  test("a relative pointer name refuses instead of auto-opening a local store") {
    // 'team/prod' is a mistyped REGISTERED name, not a path: silently
    // creating an empty local store dir would fork a fresh lineage
    assert(GraftStores.resolve("team/prod_r17_unregistered").isEmpty)
    assert(!new java.io.File("team").exists(),
      "resolve created a local directory for a relative name")
    // unambiguous path shapes still auto-open
    val dir = s"${tmpDir("gs_path")}/cell"
    assert(GraftStores.resolve(dir).isDefined)        // absolute path
    assert(GraftStores.resolve(s"file:$dir").isDefined) // URI scheme
  }

  test("file store: two PROCESSES hammering the same cell — every CAS has exactly one winner") {
    // the thread race above shares a JVM; hardlink create-exclusive is
    // the cross-process arbiter, so prove it across real process
    // boundaries: two forked JVMs each CAS-increment the cell until
    // they have personally won 40 times. Every successful putIf
    // advances the value by exactly 1, so a double winner anywhere
    // leaves the final value short of the summed wins.
    val dir = s"${tmpDir("fcs_procs")}/cell"
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    def fork(): Process = new ProcessBuilder(
      javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.CasHammer", dir, "40").redirectErrorStream(true).start()
    val procs = Seq(fork(), fork())
    val outs = procs.map(p =>
      new String(p.getInputStream.readAllBytes(), "UTF-8"))
    procs.foreach(p => assert(p.waitFor() == 0,
      s"hammer process failed:\n${outs.mkString("\n")}"))
    outs.foreach(o => assert(o.contains("wins=40"), o))
    val s = fileStore(dir)
    assert(s.get().contains("80"),
      s"lost or doubled CAS across processes: final=${s.get()} (want 80)")
  }

  // ---- FileConditionalStore: the cold-restart table twin ----

  test("CAS table on a file store survives a cold restart: commit+tag, drop handles, re-open, read/time-travel/expire") {
    val root = s"${tmpDir("fcs_table")}/tbl"
    val cellDir = s"${tmpDir("fcs_table_cell")}/cell"
    // "process 1": register the store like any deployment would,
    // commit three versions, pin a tag
    val store1 = fileStore(cellDir)
    GraftStores.register("durable_test", store1)
    try {
      val t1 = new SnapshotTable(spark, root, Seq("year", "month"), Some(store1))
      t1.commitOverwrite(frame((1, 2024, 1, 1.0)))
      t1.commitAppend(frame((2, 2024, 2, 2.0)))
      t1.tag("audited", 2)
      t1.commitAppend(frame((3, 2024, 3, 3.0)))
      assert(t1.currentVersion.contains(3))
    } finally GraftStores.unregister("durable_test")
    // "process 2": every handle and registry entry is gone; a brand-new
    // store instance on the same directory IS the cold restart (the
    // in-memory reference store would serve "no table" here)
    val store2 = fileStore(cellDir)
    val t2 = new SnapshotTable(spark, root, Seq("year", "month"), Some(store2))
    assert(t2.currentVersion.contains(3), "table evaporated across restart")
    assert(state(t2.read()) == Set(1, 2, 3))
    assert(state(t2.readVersion(2)) == Set(1, 2), "time travel broke")
    assert(t2.tags.toMap == Map("audited" -> 2), "tag lost across restart")
    assert(state(t2.readTag("audited")) == Set(1, 2))
    // maintenance runs over the reopened pointer: expire keeps the tag
    // reachable (contiguous retention down to the pinned version)
    t2.expire(keepLast = 1)
    assert(state(t2.readTag("audited")) == Set(1, 2))
    assert(t2.fsck().isEmpty, s"fsck after cold restart: ${t2.fsck()}")
    // racing writers ACROSS store handles (old handle vs reopened one):
    // the filesystem arbitrates a single winner per generation
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq((fileStore(cellDir), 7), (store2, 8)).map { case (st, id) =>
      new Thread(() => {
        try {
          val h = new SnapshotTable(spark, root, Seq("year", "month"), Some(st))
          h.commitWithRetry()(h.commitAppend(frame((id, 2024, id, id * 1.0))))
          ()
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"cross-handle race failed: ${Option(errs.peek()).map(_.getMessage)}")
    assert(state(t2.read()).contains(7))
    assert(state(t2.read()).contains(8))
  }

  test("SQL surface: a path-shaped pointer option opens a durable file store with zero registration") {
    val root = s"${tmpDir("fcs_sql")}/tbl"
    val cellDir = s"${tmpDir("fcs_sql_cell")}/cell"
    // write through the format with pointer '<dir>' — nothing registered
    val df = frame((1, 2024, 1, 1.0))
    df.write.format("graft").option("pointer", cellDir).save(root)
    frame((2, 2024, 2, 2.0)).write.format("graft").mode("append")
      .option("pointer", cellDir).save(root)
    // "restart": drop the cached store so the next resolve re-opens cold
    GraftStores.unregister(cellDir)
    val back = spark.read.format("graft").option("pointer", cellDir).load(root)
    assert(state(back) == Set(1, 2))
    val v1 = spark.read.format("graft").option("pointer", cellDir)
      .option("versionAsOf", 1).load(root)
    assert(state(v1) == Set(1))
    GraftStores.unregister(cellDir)
    // a non-path name still refuses with the registration hook named
    val e = intercept[RuntimeException] {
      spark.read.format("graft").option("pointer", "unregistered_name").load(root)
    }
    assert(e.getMessage.contains("GraftStores.register"), e.getMessage)
  }

  test("shallow clone into CAS mode: zero-copy clone arbitrates through a durable store, survives cold re-open") {
    // the object-store deployment shape: an Fs-mode clone cannot exist
    // there at all (no atomic create-exclusive), so the zero-copy
    // dev/experiment clone publishes its v1 through a store CAS
    val srcRoot = s"${tmpDir("shc_src")}/tbl"
    val src = new SnapshotTable(spark, srcRoot, Seq("year", "month"))
    src.commitOverwrite(frame((1, 2024, 1, 1.0), (2, 2024, 2, 2.0)))
    val cellDir = s"${tmpDir("shc_cell")}/cell"
    val cloneRoot = s"${tmpDir("shc_dst")}/tbl"
    val clone = src.shallowClone(cloneRoot, Some(fileStore(cellDir)))
    assert(clone.currentVersion.contains(1))
    assert(state(clone.read()) == Set(1, 2))
    // the CAS-mode clone registered its borrow lease on the source too
    assert(src.borrowLeases().exists(_.cloneRoot.endsWith("/tbl")),
      s"CAS clone left no lease: ${src.borrowLeases()}")
    // the clone diverges through its own CAS commits; source untouched
    clone.commitAppend(frame((3, 2024, 3, 3.0)))
    assert(state(clone.read()) == Set(1, 2, 3))
    assert(state(src.read()) == Set(1, 2), "clone commit leaked into source")
    // no CURRENT file — the pointer IS the store
    assert(!fs(cloneRoot).exists(new Path(cloneRoot, "_manifests/CURRENT")))
    // cold re-open on a fresh store handle
    val reopened = new SnapshotTable(spark, cloneRoot, Seq("year", "month"),
      Some(fileStore(cellDir)))
    assert(state(reopened.read()) == Set(1, 2, 3))
    assert(reopened.fsck().isEmpty, s"fsck: ${reopened.fsck()}")
    // a non-empty destination store refuses rather than orphaning it —
    // and the refusal rolls back the just-registered borrow lease, so
    // the failed attempt leaves no retention pin on the source
    val dst2 = s"${tmpDir("shc_dst2")}/tbl"
    val e = intercept[RuntimeException] {
      src.shallowClone(dst2, Some(fileStore(cellDir))) }
    assert(e.getMessage.contains("not empty"), e.getMessage)
    assert(!src.borrowLeases().exists(_.cloneRoot.endsWith(dst2)),
      s"refused clone left a lease: ${src.borrowLeases()}")
  }

  // ---- JdbcConditionalStore: the catalog-database shape, over Derby ----

  private def derbyUrl(tag: String): String =
    s"jdbc:derby:${tmpDir(tag)}/casdb;create=true"

  test("jdbc store: putIf contract over embedded Derby") {
    val url = derbyUrl("jdbc_contract")
    val s = new JdbcConditionalStore(url, "cell_a")
    try {
      assert(s.get().isEmpty)
      assert(!s.putIf(Some("x"), "y"))
      assert(s.putIf(None, "v1"))
      assert(!s.putIf(None, "other"))
      assert(s.putIf(Some("v1"), "v2"))
      assert(!s.putIf(Some("v1"), "v3"))
      assert(s.get().contains("v2"))
      // cells are independent rows of the same database
      val other = new JdbcConditionalStore(url, "cell_b")
      try {
        assert(other.get().isEmpty)
        assert(other.putIf(None, "w1"))
        assert(s.get().contains("v2"))
      } finally other.close()
      // a SECOND connection to the same database and cell arbitrates
      // against the first through the database, not the JVM
      val s2 = new JdbcConditionalStore(url, "cell_a")
      try {
        assert(s2.get().contains("v2"))
        assert(s2.putIf(Some("v2"), "v3"))
        assert(!s.putIf(Some("v2"), "stale"), "first handle must lose on stale")
        assert(s.get().contains("v3"))
      } finally s2.close()
    } finally s.close()
  }

  test("CAS table on a jdbc store: racing writers on two connections, cold re-open green") {
    val url = derbyUrl("jdbc_table")
    val root = s"${tmpDir("jdbc_table_root")}/tbl"
    val store1 = new JdbcConditionalStore(url, "tbl")
    try {
      val t = new SnapshotTable(spark, root, Seq("year", "month"), Some(store1))
      t.commitOverwrite(frame((1, 2024, 1, 1.0)))
      t.tag("base", 1)
      // two writers, each on its OWN connection: the database's
      // conditional update arbitrates one winner per version
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(2, 3).map { id =>
        new Thread(() => {
          try {
            val st = new JdbcConditionalStore(url, "tbl")
            try {
              val h = new SnapshotTable(spark, root, Seq("year", "month"), Some(st))
              h.commitWithRetry()(h.commitAppend(frame((id, 2024, id, id * 1.0))))
              ()
            } finally st.close()
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"jdbc race failed: ${Option(errs.peek()).map(_.getMessage)}")
      assert(t.currentVersion.contains(3))
      assert(state(t.read()) == Set(1, 2, 3))
      // no orphan attempts: every CAS loser cleaned its manifest
      val mdir = new Path(root, "_manifests")
      val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mfiles = fsys.listStatus(mdir).map(_.getPath.getName)
        .filter(_.matches("v\\d+_[0-9a-f]{8}\\.txt"))
      assert(mfiles.length == 3, s"orphan attempts: ${mfiles.toSeq}")
    } finally store1.close()
    // cold re-open on a fresh connection: history, tag, time travel
    val store2 = new JdbcConditionalStore(url, "tbl")
    try {
      val t2 = new SnapshotTable(spark, root, Seq("year", "month"), Some(store2))
      assert(t2.currentVersion.contains(3))
      assert(t2.tags.toMap == Map("base" -> 1))
      assert(state(t2.readTag("base")) == Set(1))
      assert(state(t2.readVersion(2)).size == 2)
      assert(t2.fsck().isEmpty)
    } finally store2.close()
  }

  // ---- the CAS ref bound: pointer value stays O(KB), refusal is loud ----

  test("jdbc store: connection killed mid-sequence — the handle reconnects and recovers") {
    // the deployment case the store exists for: a network database
    // drops idle connections. Derby database shutdown kills every open
    // connection to it, the closest embeddable equivalent.
    val db = s"${tmpDir("jdbc_kill")}/casdb"
    val s = new JdbcConditionalStore(s"jdbc:derby:$db;create=true", "cell")
    try {
      assert(s.putIf(None, "v1"))
      intercept[java.sql.SQLException] { // 08006 IS the success signal
        java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true") }
      // the read reconnects once (re-booting the db) and serves the value
      assert(s.get().contains("v1"), "read did not recover across reconnect")
      // CAS semantics intact on the healed handle
      assert(s.putIf(Some("v1"), "v2"))
      assert(!s.putIf(Some("v1"), "x"))
      assert(s.get().contains("v2"))
    } finally s.close()
  }

  test("jdbc store: reconnect failing too refuses loudly naming the remedy") {
    val db = s"${tmpDir("jdbc_dead")}/casdb"
    new JdbcConditionalStore(s"jdbc:derby:$db;create=true", "boot").close()
    // open WITHOUT create=true: once the database is gone, reconnect
    // cannot silently mint a fresh empty one (which would read as an
    // empty cell — a forked lineage, not an error)
    val s = new JdbcConditionalStore(s"jdbc:derby:$db", "cell")
    try {
      assert(s.get().isEmpty)
      intercept[java.sql.SQLException] {
        java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true") }
      // destroy the database: reconnect now has nothing to open
      def rmRf(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rmRf); f.delete(); () }
      rmRf(new java.io.File(db))
      val e = intercept[IllegalStateException] { s.get() }
      assert(e.getMessage.contains("reconnect failed"), e.getMessage)
      assert(e.getMessage.contains("restore database connectivity"), e.getMessage)
    } finally s.close()
  }

  test("CAS refs are bounded: 256 tags racing commits land, the 257th refuses loudly, pointer value pinned") {
    import graft.write.InMemoryConditionalStore
    val root = s"${tmpDir("cas_refbound")}/tbl"
    val store = InMemoryConditionalStore(s"cas_refbound_$root")
    val t = new SnapshotTable(spark, root, Seq("year", "month"), Some(store))
    t.commitOverwrite(frame((1, 2024, 1, 1.0)))
    // commits race the tag creators through the same cell: ref CASes
    // retried on unrelated-line movement must still respect the bound
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val committer = new Thread(() => {
      try {
        val h = new SnapshotTable(spark, root, Seq("year", "month"), Some(store))
        (2 to 5).foreach { id =>
          h.commitWithRetry()(h.commitAppend(frame((id, 2024, id, id * 1.0)))) }
      } catch { case e: Throwable => errs.add(e) }
    })
    committer.start()
    (1 to 256).foreach(i => t.tag(f"t$i%03d", 1))
    committer.join()
    assert(errs.isEmpty, s"racing commits failed: ${Option(errs.peek()).map(_.getMessage)}")
    assert(t.tags.size == 256)
    assert(t.currentVersion.contains(5))
    // the 257th ref refuses with the remedy named (bound = 256)
    val e = intercept[IllegalArgumentException] { t.tag("one_too_many", 1) }
    assert(e.getMessage.contains("256") && e.getMessage.contains("Drop unused"),
      e.getMessage)
    // pointer-value size pin: 256 refs + head stay well under 16 KB, so
    // a commit CAS re-writes O(KB) through the store, never unbounded
    val len = store.get().get.length
    assert(len < 16384, s"pointer value blew past the documented bound: $len bytes")
    // dropping a tag frees capacity
    t.dropTag("t001")
    t.tag("one_more_fits", 1)
    assert(t.tags.size == 256)
  }
}
