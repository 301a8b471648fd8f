package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.SnapshotTable

/** Shallow-clone contract: zero-copy creation, full state carry
  * (masks + MOR deletes + constraints), divergence isolation both
  * directions, maintenance safety (the clone can never reclaim a
  * borrowed dir; purge refuses until localized), and the documented
  * source-retention hazard surfacing through fsck. */
class ShallowCloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(rows: (Int, Int, Int, Double)*) = {
    import spark.implicits._
    rows.toDF("id", "year", "month", "fare")
  }

  private def freshRoot(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    s"$dir/tbl"
  }

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def state(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Int, Double)] =
    df.select(col("id"), col("year"), col("month"), col("fare"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet

  /** Parquet files physically under a table's own `_data`. */
  private def ownedParquetCount(root: String): Int = {
    val p = new Path(root, "_data")
    val f = fs(root)
    if (!f.exists(p)) 0
    else {
      val it = f.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
  }

  test("zero-copy creation carries masks, MOR deletes, and constraints") {
    val src = new SnapshotTable(spark, freshRoot("shc_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0), (3, 2024, 2, 25.0)))
    src.commitOverwritePartitions(frame((9, 2024, 2, 99.0)))   // masks v1's month 2
    src.commitDeleteMor(col("id") === 1)                        // MOR predicate delete
    src.addConstraint("pos", "fare > 0")
    val expected = state(src.read())
    assert(expected == Set((9, 2024, 2, 99.0)))

    val clone = src.shallowClone(freshRoot("shc_dst"))
    // state identity through masks + MOR deletes, with ZERO owned bytes
    assert(state(clone.read()) == expected)
    assert(ownedParquetCount(clone.location) == 0, "shallow clone copied data files")
    assert(clone.currentVersion.contains(1))
    assert(clone.history.map(_._2) == Seq("shallow_clone_v4"))
    // constraints carried: a violating append on the CLONE refuses
    assert(clone.constraints.map(_._1) == Seq("pos"))
    val e = intercept[Exception] { clone.commitAppend(frame((7, 2024, 3, -1.0))) }
    assert(e.getMessage.contains("constraint 'pos'"))
    // history/tags/branches do NOT transfer: the clone is state, not lineage
    assert(clone.tags.isEmpty)
  }

  test("clone and source diverge independently after the clone point") {
    val src = new SnapshotTable(spark, freshRoot("shc_div_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
    val clone = src.shallowClone(freshRoot("shc_div_dst"))
    val at = state(src.read())

    clone.commitAppend(frame((3, 2024, 3, 30.0)))
    src.commitAppend(frame((4, 2024, 4, 40.0)))
    assert(state(clone.read()) == at + ((3, 2024, 3, 30.0)))
    assert(state(src.read()) == at + ((4, 2024, 4, 40.0)))
    // the clone's new commit minted an OWNED dir; the borrowed one is
    // still byte-free on the clone's side
    assert(ownedParquetCount(clone.location) > 0)
    // clone-side dynamic partition overwrite masks a borrowed dir's
    // partition without touching the source
    clone.commitOverwritePartitions(frame((8, 2024, 1, 11.0)))
    assert(state(clone.read()) ==
      Set((8, 2024, 1, 11.0), (2, 2024, 2, 20.0), (3, 2024, 3, 30.0)))
    assert(state(src.read()) == at + ((4, 2024, 4, 40.0)), "clone write leaked into source")
  }

  test("clone maintenance can never reclaim borrowed dirs; purge refuses until localized") {
    val src = new SnapshotTable(spark, freshRoot("shc_mx_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
    val clone = src.shallowClone(freshRoot("shc_mx_dst"))
    clone.commitAppend(frame((3, 2024, 3, 30.0)))
    clone.commitAppend(frame((4, 2024, 4, 40.0)))

    // expire+vacuum the clone down to its head with zero retention age:
    // listing-based sweeps cannot see (so cannot delete) borrowed dirs
    clone.expire(keepLast = 1, olderThanMs = 0L)
    assert(clone.vacuum(olderThanMs = 0L).isEmpty)
    assert(state(src.read()) == Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)),
      "clone maintenance damaged the source")
    assert(state(clone.read()) ==
      Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0), (3, 2024, 3, 30.0), (4, 2024, 4, 40.0)))

    // purge refuses while any manifest still borrows
    val e = intercept[Exception] { clone.purge(col("id") === 1) }
    assert(e.getMessage.contains("shallow clone"))

    // localize (one compaction commit), retire borrowing history — now
    // purge works and the source remains untouched
    clone.commitCompactFiles()
    clone.expire(keepLast = 1, olderThanMs = 0L)
    assert(clone.purge(col("id") === 1) > 0)
    assert(!state(clone.read()).exists(_._1 == 1))
    assert(state(src.read()) == Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
  }

  test("fsck names the source-retention hazard; chained clones resolve") {
    val src = new SnapshotTable(spark, freshRoot("shc_fsck_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val c1 = src.shallowClone(freshRoot("shc_fsck_c1"))
    // a clone of a clone borrows the ORIGINAL dirs (absolute stays
    // absolute), so the chain has one owner, not a linked list
    val c2 = c1.shallowClone(freshRoot("shc_fsck_c2"))
    assert(state(c2.read()) == Set((1, 2024, 1, 10.0)))
    assert(ownedParquetCount(c2.location) == 0)
    assert(c1.fsck().isEmpty && c2.fsck().isEmpty)

    // source reclaims the dir (the documented hazard): both clones'
    // fsck must say exactly what happened
    val srcData = new Path(src.location, "_data")
    fs(src.location).delete(srcData, true)
    assert(c1.fsck().exists(_.contains("borrowed data dir missing")))
    assert(c2.fsck().exists(_.contains("borrowed data dir missing")))
  }

  private def qualified(root: String): String =
    fs(root).makeQualified(new Path(root)).toString

  test("borrow lease: source expire/vacuum retain dirs a live clone borrows") {
    val src = new SnapshotTable(spark, freshRoot("shc_lease_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val clone = src.shallowClone(freshRoot("shc_lease_dst"))
    assert(src.borrowLeases().map(_.cloneRoot) == Seq(qualified(clone.location)))

    // the source moves on: after overwrite + expire + zero-age vacuum,
    // the borrowed dir is referenced by NO retained source manifest —
    // pre-lease, exactly the state where retention ate it
    src.commitOverwrite(frame((2, 2024, 2, 20.0)))
    src.expire(keepLast = 1, olderThanMs = 0L)
    assert(src.vacuum(olderThanMs = 0L).isEmpty, "vacuum collected a leased dir")
    assert(state(clone.read()) == Set((1, 2024, 1, 10.0)),
      "source retention broke a leased clone")
    assert(clone.fsck().isEmpty)

    // dropping the clone (directory deletion — how tables die here)
    // stales the lease; the next consultation sweeps it and retention
    // reclaims the dir
    fs(clone.location).delete(new Path(clone.location), true)
    assert(src.borrowLeases().isEmpty, "dropped clone's lease not swept")
    assert(src.vacuum(olderThanMs = 0L).nonEmpty,
      "dir not reclaimable after the clone dropped")
  }

  test("borrow lease: source purge refuses naming the clone; localize releases") {
    val src = new SnapshotTable(spark, freshRoot("shc_purge_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
    val clone = src.shallowClone(freshRoot("shc_purge_dst"))

    val e = intercept[Exception] { src.purge(col("id") === 1) }
    assert(e.getMessage.contains(qualified(clone.location)), "refusal must name the clone")
    assert(e.getMessage.contains("Localize"), "refusal must name the remedy")

    // localize: one compaction commit + expire of the borrowing
    // history — the expire auto-releases the lease, and the source's
    // purge (and full retention) proceeds
    clone.commitCompactFiles()
    clone.expire(keepLast = 1, olderThanMs = 0L)
    assert(src.borrowLeases().isEmpty, "localized clone's lease not released")
    assert(src.purge(col("id") === 1) > 0)
    assert(state(clone.read()) == Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)),
      "localized clone must not see the source's purge")
  }

  test("borrow lease: chained clones lease the ORIGINAL owner; releases are per-clone") {
    val src = new SnapshotTable(spark, freshRoot("shc_chain_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val c1 = src.shallowClone(freshRoot("shc_chain_c1"))
    val c2 = c1.shallowClone(freshRoot("shc_chain_c2"))
    // absolute stays absolute: both leases land on the table that owns
    // the bytes, and the middle clone holds none of its own
    assert(src.borrowLeases().map(_.cloneRoot).sorted ==
      Seq(qualified(c1.location), qualified(c2.location)).sorted)
    assert(c1.borrowLeases().isEmpty)

    c1.commitCompactFiles()
    c1.expire(keepLast = 1, olderThanMs = 0L)
    assert(src.borrowLeases().map(_.cloneRoot) == Seq(qualified(c2.location)),
      "localizing c1 must release only c1's lease")
    // c2 survives source retention through its own lease
    src.commitOverwrite(frame((9, 2025, 1, 90.0)))
    src.expire(keepLast = 1, olderThanMs = 0L)
    src.vacuum(olderThanMs = 0L)
    assert(state(c2.read()) == Set((1, 2024, 1, 10.0)))
  }

  test("borrow lease: a deep copy of a live shallow clone holds its OWN lease") {
    val src = new SnapshotTable(spark, freshRoot("shc_deep_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val sc = src.shallowClone(freshRoot("shc_deep_sc"))
    val dc = sc.deepClone(freshRoot("shc_deep_dc"))
    // the copy's manifests still reference src's dirs (absolute URIs
    // copy verbatim), so it registered a fresh lease in its own name —
    // and the copied bookkeeping was scrubbed: dropping the ORIGINAL
    // clone neither strands nor releases the copy
    assert(src.borrowLeases().size == 2)
    fs(sc.location).delete(new Path(sc.location), true)
    assert(src.borrowLeases().map(_.cloneRoot) == Seq(qualified(dc.location)))
    src.commitOverwrite(frame((9, 2025, 1, 90.0)))
    src.expire(keepLast = 1, olderThanMs = 0L)
    src.vacuum(olderThanMs = 0L)
    assert(state(dc.read()) == Set((1, 2024, 1, 10.0)),
      "source retention broke the deep copy's borrowed reads")
  }

  test("localize(): one call owns every byte, releases the lease; pinned history refuses") {
    val src = new SnapshotTable(spark, freshRoot("shc_loc_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
    val clone = src.shallowClone(freshRoot("shc_loc_dst"))
    clone.commitAppend(frame((3, 2024, 3, 30.0)))
    val before = state(clone.read())

    clone.localize()
    assert(src.borrowLeases().isEmpty, "localize did not release the lease")
    assert(ownedParquetCount(clone.location) > 0)
    assert(state(clone.read()) == before, "localize changed the state")
    assert(clone.purge(col("id") === 1) > 0, "localized clone must purge")
    // a table that borrows nothing: no-op
    src.localize()
    assert(state(src.read()) == Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))

    // a tag pinning borrowing history outranks localize — the refusal
    // names the pin (expire keeps tagged versions; the promise wins)
    val c2 = src.shallowClone(freshRoot("shc_loc_pin"))
    c2.tag("keep", 1)
    val e = intercept[Exception] { c2.localize() }
    assert(e.getMessage.contains("keep"), e.getMessage)
    assert(src.borrowLeases().nonEmpty, "a refused localize must keep the lease")
    c2.dropTag("keep")
    c2.localize()
    assert(src.borrowLeases().isEmpty)
  }

  test("borrow lease: a crashed clone attempt's lease is swept once aged; in-flight is retained") {
    val src = new SnapshotTable(spark, freshRoot("shc_crash_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val clone = src.shallowClone(freshRoot("shc_crash_live"))

    // simulate a clone attempt that crashed between lease registration
    // and its v1 publish: `_manifests` exists but holds no manifest,
    // and the lease file sits under the owner exactly as the clone
    // wrote it (same wire format)
    val aborted = freshRoot("shc_crash_aborted")
    val afs = fs(aborted)
    afs.mkdirs(new Path(aborted, "_manifests"))
    val dirName = src.borrowLeases().head.dirs.head
    val leasePath = new Path(new Path(src.location, "_borrowed_by"),
      "deadbeefdeadbeef.txt")
    val sfs = fs(src.location)
    val out = sfs.create(leasePath, false)
    out.write(s"clone=${qualified(aborted)}\ndir=$dirName".getBytes("UTF-8"))
    out.close()
    // young + empty `_manifests` = publish in flight: retained even by
    // the sweeping consultation
    assert(src.borrowLeases().size == 2, "fresh in-flight lease must count alive")

    // backdate the lease past the orphan-age window: now it is a
    // crashed attempt and the next consultation sweeps it — the live
    // clone's lease survives
    val old = System.currentTimeMillis() - 2 * 3600L * 1000
    sfs.setTimes(leasePath, old, -1)
    assert(src.borrowLeases().map(_.cloneRoot) == Seq(qualified(clone.location)),
      "aged crashed-attempt lease not swept (or live lease lost)")
    // idempotent: swept stays swept, live stays live
    assert(src.borrowLeases().map(_.cloneRoot) == Seq(qualified(clone.location)))
  }

  test("borrow lease: an orphaned lease heals once its clone localized (marker gone)") {
    val src = new SnapshotTable(spark, freshRoot("shc_heal_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val clone = src.shallowClone(freshRoot("shc_heal_dst"))
    val borrowedBy = new Path(src.location, "_borrowed_by")
    val sfs = fs(src.location)
    val leasePath = sfs.listStatus(borrowedBy).map(_.getPath)
      .find(_.getName.endsWith(".txt")).get

    // simulate the transient-failure orphan: the clone localized (its
    // marker is gone, its state fully owned) but the owner-side lease
    // delete never landed — backdated past the age floor, the next
    // consultation must treat it as released instead of pinning
    // retention forever
    clone.commitCompactFiles()
    fs(clone.location).delete(new Path(clone.location, "_borrow_lease.txt"), false)
    val old = System.currentTimeMillis() - 2 * 3600L * 1000
    sfs.setTimes(leasePath, old, -1)
    assert(src.borrowLeases().isEmpty, "localized clone's orphaned lease must heal")
    assert(!sfs.exists(leasePath))

    // but an aged lease whose clone is STILL borrowing (marker present)
    // stays alive — age alone never sweeps a live borrower
    val c2 = src.shallowClone(freshRoot("shc_heal_live"))
    val lease2 = sfs.listStatus(borrowedBy).map(_.getPath)
      .find(_.getName.endsWith(".txt")).get
    sfs.setTimes(lease2, old, -1)
    assert(src.borrowLeases().map(_.cloneRoot) == Seq(qualified(c2.location)),
      "an aged but live borrower's lease must never be swept")
  }

  test("localize() works on a borrowing clone whose lease marker is gone") {
    val src = new SnapshotTable(spark, freshRoot("shc_nomark_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
    val clone = src.shallowClone(freshRoot("shc_nomark_dst"))
    // a pre-lease-era clone (or out-of-band marker loss): still
    // borrowing, but no _borrow_lease.txt. purge refuses naming
    // localize() as the remedy — localize() must not silently no-op on
    // the marker's absence, or the operator loops between the two.
    fs(clone.location).delete(new Path(clone.location, "_borrow_lease.txt"), false)
    intercept[Exception] { clone.purge(col("id") === 1) }
    clone.localize()
    assert(ownedParquetCount(clone.location) > 0,
      "marker-less localize no-opped instead of minting owned dirs")
    assert(clone.purge(col("id") === 1) > 0)
    assert(state(src.read()) == Set((1, 2024, 1, 10.0), (2, 2024, 2, 20.0)))
  }

  test("lease re-registration merges dir sets atomically (same-destination race)") {
    val src = new SnapshotTable(spark, freshRoot("shc_merge_src"))
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val conf = spark.sparkContext.hadoopConfiguration
    val srcQ = qualified(src.location)
    val cloneRoot = qualified(freshRoot("shc_merge_dst"))
    def dirUri(d: String) = s"$srcQ/_data/$d"
    // racer 1 registers dirs {dA}; racer 2 (same destination, source
    // moved in between) re-registers {dB}: the lease must end as the
    // UNION — dropping dA would let owner retention eat the dir the
    // eventual winner still borrows
    graft.write.SnapshotTable.registerBorrow(conf, cloneRoot, Seq(dirUri("dA")))
    graft.write.SnapshotTable.registerBorrow(conf, cloneRoot, Seq(dirUri("dB")))
    val leasePath = new Path(new Path(src.location, "_borrowed_by"),
      graft.write.SnapshotTable.leaseIdFor(cloneRoot) + ".txt")
    val sfs = fs(src.location)
    val content = scala.io.Source.fromInputStream(sfs.open(leasePath)).mkString
    assert(content.contains("dir=dA") && content.contains("dir=dB"),
      s"re-registration must union, got: $content")
    sfs.delete(leasePath, false) // don't leave a lease pinning src
  }

  test("destination must be empty; clone of nothing refuses") {
    val src = new SnapshotTable(spark, freshRoot("shc_refuse_src"))
    intercept[Exception] { src.shallowClone(freshRoot("shc_refuse_d0")) } // no snapshot yet
    src.commitOverwrite(frame((1, 2024, 1, 10.0)))
    val occupied = freshRoot("shc_refuse_d1")
    new SnapshotTable(spark, occupied).commitOverwrite(frame((2, 2024, 2, 2.0)))
    val e = intercept[Exception] { src.shallowClone(occupied) }
    assert(e.getMessage.contains("destination exists"))
  }
}
