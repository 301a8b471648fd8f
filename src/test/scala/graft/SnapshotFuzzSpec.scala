package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.write.SnapshotTable

/** Model-based fuzz over the snapshot table's whole mutation surface.
  *
  * The targeted specs pin each operator's contract in isolation; this
  * suite pins their COMPOSITION: seeded random sequences of
  * append / overwrite-partitions / COW merge / MOR merge / COW delete /
  * MOR predicate delete / compact / expire / vacuum / rollback / tag /
  * purge are replayed against an in-memory multiset model, and after
  * every step the table's current state — and after every maintenance
  * op, every retained version's time travel — must equal the model
  * exactly (multiset compare, so duplicate rows count). Fixed seeds:
  * a failure replays deterministically from the seed in the test name.
  *
  * The clone test drives the round-17 borrow-lease machinery through a
  * full adversarial lifecycle: source keeps mutating and running
  * immediate-window expire/vacuum while a live shallow clone borrows
  * its dirs (the leases must keep every borrowed dir readable), purge
  * refuses on both sides naming the remedy, and after localize() the
  * source's maintenance and purge proceed while the clone — now
  * self-owned — still reads its model.
  */
class SnapshotFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type Row4 = (Int, Int, Int, Double)
  private type MS = Map[Row4, Int]

  private def ms(rows: Seq[Row4]): MS =
    rows.groupBy(identity).map { case (k, v) => k -> v.size }
  private def add(a: MS, rows: Seq[Row4]): MS =
    rows.foldLeft(a)((m, r) => m + (r -> (m.getOrElse(r, 0) + 1)))
  private def removeWhere(a: MS, p: Row4 => Boolean): MS =
    a.filterNot { case (r, _) => p(r) }

  private def msOf(df: DataFrame): MS = ms(
    df.select(col("id"), col("year"), col("month"), col("fare"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))))

  private def toDF(rows: Seq[Row4]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "year", "month", "fare")
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/tbl"

  /** A random batch over a deliberately small domain (20 ids, 3
    * months) so merges collide with existing keys and partition
    * overwrites hit existing partitions. Integral fares: every value
    * round-trips parquet bit-exactly, so multiset equality is sound. */
  private def randBatch(rnd: scala.util.Random, n: Int): Seq[Row4] =
    Seq.fill(n)((1 + rnd.nextInt(20), 2024, 1 + rnd.nextInt(3),
      rnd.nextInt(100).toDouble))

  /** A random predicate as (Column, model predicate) — both sides of
    * the check derive from the same drawn constants. */
  private def randCond(rnd: scala.util.Random)
      : (org.apache.spark.sql.Column, Row4 => Boolean) =
    rnd.nextInt(3) match {
      case 0 => val x = rnd.nextInt(100).toDouble
        (col("fare") < x, r => r._4 < x)
      case 1 => val m = 1 + rnd.nextInt(3)
        (col("month") === m, r => r._3 == m)
      case _ => val k = 2 + rnd.nextInt(3)
        (col("id") % k === 0, r => r._1 % k == 0)
    }

  /** Returns the set of op kinds the seed actually executed, so the
    * tests can pin that every seed covers the whole menu (a menu or
    * seed edit that silently drops an op from coverage fails loudly).
    * `mode` selects the arbitration: "fs" (create-exclusive
    * manifests), "file" (CAS through a FileConditionalStore), or
    * "jdbc" (CAS through a JdbcConditionalStore over embedded Derby —
    * the catalog-database deployment shape). CAS modes have a
    * different commit protocol AND different expire contiguity rules;
    * the model adapts by re-reading `history` after retention.
    */
  private def runFuzz(seed: Long, steps: Int, mode: String = "fs"): Set[String] = {
    val rnd = new scala.util.Random(seed)
    val pointer = mode match {
      case "fs" => None
      case "file" => Some(graft.write.FileConditionalStore.open(
        java.nio.file.Files.createTempDirectory(s"graft_fuzzstore$seed").toString))
      case "jdbc" => Some(new graft.write.JdbcConditionalStore(
        s"jdbc:derby:${java.nio.file.Files.createTempDirectory(s"graft_fuzzdb$seed")}/casdb;create=true",
        s"fuzz_cell_$seed"))
    }
    val t = new SnapshotTable(spark, freshRoot(s"fuzz$seed"),
      Seq("year", "month"), pointer)

    val init = randBatch(rnd, 4)
    var model: MS = ms(init)
    var cur = t.commitOverwrite(toDF(init))
    var versions: Map[Int, MS] = Map(cur -> model)
    var tagged: Map[String, Int] = Map.empty
    // branch lineages: name -> modeled state; TWO branches seeded so
    // branch_commit/ff (needs >= 1 live) and branch_drop (keeps >= 1
    // live) are executable wherever the shuffle lands them
    var brModel: Map[String, MS] = Map.empty
    Seq("b0", "b1").foreach { n => t.createBranch(n, cur); brModel += n -> model }

    // set AFTER the model update for the op, so the recorded state is
    // the post-op one
    def record(v: Int): Unit = { cur = v; versions += v -> model }

    def checkCurrent(step: Int, op: String): Unit =
      assert(msOf(t.read()) == model, s"seed=$seed step=$step after $op")

    def checkRetained(step: Int, op: String): Unit = {
      val live = t.history.map(_._1).toSet
      versions = versions.filter { case (v, _) => live(v) }
      versions.foreach { case (v, st) =>
        assert(msOf(t.readVersion(v)) == st,
          s"seed=$seed step=$step after $op: time travel v$v diverged")
      }
      brModel.foreach { case (n, st) =>
        assert(msOf(t.readBranch(n)) == st,
          s"seed=$seed step=$step after $op: branch $n diverged")
      }
    }

    // weighted op menu: mutation-heavy, with enough maintenance mixed
    // in that retention runs against every commit shape
    val menu = Seq(
      "append", "append", "append",
      "overwrite_parts", "overwrite_parts",
      "merge", "merge", "merge",
      "merge_mor", "merge_mor",
      "delete", "delete_mor",
      "compact_files", "compact_cluster",
      "expire", "expire",
      "vacuum", "rollback", "tag", "purge",
      "branch_commit", "branch_commit",
      "branch_create", "branch_ff", "branch_drop")

    // every distinct op at least once per run (coverage by
    // construction), the rest drawn with the menu's weights, the whole
    // schedule shuffled so maintenance lands at random points
    val schedule = rnd.shuffle(menu.distinct ++
      Seq.fill(math.max(0, steps - menu.distinct.size))(
        menu(rnd.nextInt(menu.size))))
    val drawn = scala.collection.mutable.Set.empty[String]
    for ((op, step0) <- schedule.zipWithIndex) {
      val step = step0 + 1
      // set false by the ops that can (deterministically) decline —
      // only EXECUTED ops count toward menu coverage
      var executed = true
      op match {
        case "append" =>
          val b = randBatch(rnd, 1 + rnd.nextInt(3))
          val v = t.commitAppend(toDF(b))
          model = add(model, b)
          record(v)
        case "overwrite_parts" =>
          val b = randBatch(rnd, 1 + rnd.nextInt(3))
          val parts = b.map(r => (r._2, r._3)).toSet
          val v = t.commitOverwritePartitions(toDF(b))
          model = add(removeWhere(model, r => parts((r._2, r._3))), b)
          record(v)
        case "merge" | "merge_mor" =>
          val b = randBatch(rnd, 1 + rnd.nextInt(4)).distinctBy(_._1)
          val keys = b.map(_._1).toSet
          val v = if (op == "merge") t.commitMerge(toDF(b), Seq("id"))
                  else t.commitMergeMor(toDF(b), Seq("id"))
          model = add(removeWhere(model, r => keys(r._1)), b)
          record(v)
        case "delete" =>
          val (c, p) = randCond(rnd)
          val v = t.commitDelete(c) // no-match returns the base version
          model = removeWhere(model, p)
          record(v)
        case "delete_mor" =>
          val (c, p) = randCond(rnd)
          val v = t.commitDeleteMor(c)
          model = removeWhere(model, p)
          record(v)
        case "compact_files" =>
          record(t.commitCompactFiles())
        case "compact_cluster" =>
          record(t.commitCompact("id", nFiles = 2))
        case "expire" =>
          t.expire(keepLast = 1 + rnd.nextInt(3), olderThanMs = 0L)
          checkRetained(step, op)
        case "vacuum" =>
          t.vacuum(olderThanMs = 0L)
          checkRetained(step, op)
        case "rollback" =>
          val live = t.history.map(_._1).toSet
          versions = versions.filter { case (v, _) => live(v) }
          val target = versions.keys.toSeq.sorted
            .apply(rnd.nextInt(versions.size))
          model = versions(target)
          record(t.rollbackTo(target))
          checkRetained(step, op)
        case "tag" =>
          val name = s"t$step"
          t.tag(name, cur)
          tagged += name -> cur
        case "purge" =>
          val (c, p) = randCond(rnd)
          try {
            t.purge(c)
            // history-wide erasure: every retained version AND every
            // branch lineage loses the matching rows
            model = removeWhere(model, p)
            versions = versions.map { case (v, st) => v -> removeWhere(st, p) }
            brModel = brModel.map { case (n, st) => n -> removeWhere(st, p) }
          } catch {
            // retained MOR key deletes: purge's documented refusal —
            // a no-op by contract (the guard precedes every side
            // effect that could change visible state)
            case e: IllegalArgumentException
              if e.getMessage.contains("merge-on-read") => ()
          }
          checkRetained(step, op)
        case "branch_create" =>
          if (brModel.size >= 3) executed = false // bound live branches
          else {
            val name = s"b$step"
            t.createBranch(name, cur)
            brModel += name -> model
          }
        case "branch_commit" =>
          val name = brModel.keys.toSeq.sorted.apply(rnd.nextInt(brModel.size))
          rnd.nextInt(3) match {
            case 0 =>
              val b = randBatch(rnd, 1 + rnd.nextInt(3))
              t.commitAppendToBranch(name, toDF(b))
              brModel += name -> add(brModel(name), b)
            case 1 =>
              val b = randBatch(rnd, 1 + rnd.nextInt(3))
              val parts = b.map(r => (r._2, r._3)).toSet
              t.commitOverwritePartitionsToBranch(name, toDF(b))
              brModel += name ->
                add(removeWhere(brModel(name), r => parts((r._2, r._3))), b)
            case _ =>
              val b = randBatch(rnd, 1 + rnd.nextInt(3)).distinctBy(_._1)
              val ks = b.map(_._1).toSet
              t.commitMergeToBranch(name, toDF(b), Seq("id"))
              brModel += name ->
                add(removeWhere(brModel(name), r => ks(r._1)), b)
          }
          assert(msOf(t.readBranch(name)) == brModel(name),
            s"seed=$seed step=$step: branch $name diverged after commit")
        case "branch_ff" =>
          val name = brModel.keys.toSeq.sorted.apply(rnd.nextInt(brModel.size))
          val forceOnRefusal = rnd.nextBoolean()
          try {
            val v = t.fastForward(name) // strict: succeeds iff main at fork
            model = brModel(name)
            record(v)
          } catch {
            case e: IllegalArgumentException
                if e.getMessage.contains("refused") =>
              // main moved since the fork — the documented strict
              // refusal; opt into rollback semantics half the time
              if (forceOnRefusal) {
                val v = t.fastForward(name, strict = false)
                model = brModel(name)
                record(v)
              }
          }
          checkRetained(step, op)
        case "branch_drop" =>
          if (brModel.size <= 1) executed = false // keep one branch live
          else {
            val name = brModel.keys.toSeq.sorted
              .apply(rnd.nextInt(brModel.size))
            t.dropBranch(name)
            brModel -= name
          }
      }
      if (executed) drawn += op
      checkCurrent(step, op)
    }

    // end of run: the table must be fully self-consistent — clean
    // fsck, every retained version and tag still replaying its model
    t.vacuum(olderThanMs = 0L)
    assert(t.fsck().isEmpty, s"seed=$seed fsck: ${t.fsck()}")
    checkRetained(steps + 1, "final_vacuum")
    checkCurrent(steps + 1, "final_vacuum")
    tagged.foreach { case (name, v) =>
      assert(msOf(t.readTag(name)) == versions(v),
        s"seed=$seed tag $name (v$v) diverged")
    }
    drawn.toSet
  }

  private val allOps = Set("append", "overwrite_parts", "merge", "merge_mor",
    "delete", "delete_mor", "compact_files", "compact_cluster",
    "expire", "vacuum", "rollback", "tag", "purge",
    "branch_create", "branch_commit", "branch_ff", "branch_drop")

  test("random op sequences match the multiset model (seed 1, full menu coverage)") {
    val drawn = runFuzz(seed = 1L, steps = 30)
    assert(allOps.subsetOf(drawn), s"op kinds never executed: ${allOps -- drawn}")
  }

  test("random op sequences match the multiset model (seed 2, full menu coverage)") {
    val drawn = runFuzz(seed = 2L, steps = 30)
    assert(allOps.subsetOf(drawn), s"op kinds never executed: ${allOps -- drawn}")
  }

  test("CAS-mode table: the same fuzz through a file-store pointer (seed 4)") {
    val drawn = runFuzz(seed = 4L, steps = 30, mode = "file")
    assert(allOps.subsetOf(drawn), s"op kinds never executed: ${allOps -- drawn}")
  }

  test("CAS-mode table: the same fuzz through a JDBC pointer on Derby (seed 5)") {
    val drawn = runFuzz(seed = 5L, steps = 26, mode = "jdbc")
    assert(allOps.subsetOf(drawn), s"op kinds never executed: ${allOps -- drawn}")
  }

  /** The stress body, parameterized by mode: `pointer = None` runs
    * Fs-mode arbitration (create-exclusive manifests + CURRENT flip);
    * `Some(store)` runs CAS mode (chained attempt-unique manifests,
    * one conditional put per commit). Appends COMMUTE, so the one
    * invariant that holds under ANY interleaving — no flakiness — is:
    * after all writers join, the state is exactly the union of every
    * batch, each exactly once. */
  private def runAppendStress(tag: String,
                              pointer: Option[graft.write.ConditionalStore]): Unit = {
    import graft.write.SnapshotConflictException
    val root = freshRoot(tag)
    new SnapshotTable(spark, root, Seq("year", "month"), pointer)
      .commitOverwrite(toDF(Seq((0, 2024, 1, 0.0))))
    val nThreads = 4
    val perThread = 5
    val batches = (0 until nThreads).map { ti =>
      val rnd = new scala.util.Random(100L + ti)
      Seq.fill(perThread)(randBatch(rnd, 1 + rnd.nextInt(3)))
    }
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[(String, Throwable)]
    def guard(name: String)(body: => Unit): Thread = {
      val th = new Thread(() => {
        try body
        catch { case e: Throwable => errors.add(name -> e) }
      })
      th.setName(name)
      th
    }
    val writers = (0 until nThreads).map { ti =>
      guard(s"writer-$ti") {
        val handle = new SnapshotTable(spark, root, Seq("year", "month"), pointer)
        batches(ti).foreach { b =>
          var attempts = 0
          var done = false
          while (!done) {
            try { handle.commitAppend(toDF(b)); done = true }
            catch {
              case _: SnapshotConflictException if attempts < 30 =>
                attempts += 1
            }
          }
        }
      }
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintenance = guard("maint") {
      val handle = new SnapshotTable(spark, root, Seq("year", "month"), pointer)
      while (!stop.get()) {
        handle.expire(keepLast = 3) // default olderThanMs: age-guarded
        handle.vacuum()
        Thread.sleep(50)
      }
    }
    maintenance.start(); writers.foreach(_.start())
    writers.foreach(_.join(300000))
    stop.set(true); maintenance.join(60000)
    assert(errors.isEmpty, s"worker died: ${errors.asScala.map { case (n, e) =>
      s"[$n] $e\n  " + e.getStackTrace.mkString("\n  ") }.mkString("\n")}")
    val t = new SnapshotTable(spark, root, Seq("year", "month"), pointer)
    val want = add(ms(Seq((0, 2024, 1, 0.0))), batches.flatten.flatten)
    assert(msOf(t.read()) == want,
      "concurrent appends lost or duplicated a batch")
    assert(t.fsck().isEmpty, s"post-race fsck: ${t.fsck()}")
  }

  test("concurrent appenders racing maintenance: every batch lands exactly once") {
    // a maintenance thread runs expire+vacuum concurrently at the
    // DEFAULT age windows (the in-flight-writer guard), so retention
    // races the commit protocol without being allowed to eat a dir a
    // writer has staged but not yet published — this run found the
    // recreated-slot / head-frontier / stale-flip races now pinned in
    // SnapshotSpec
    runAppendStress("fuzz_race", pointer = None)
  }

  test("concurrent appenders racing maintenance through a CAS pointer (durable store)") {
    // the same interleavings through conditional-put arbitration:
    // chained attempt-unique manifests (no recreatable slot names by
    // construction) and the FileConditionalStore generation cell with
    // its GC age floor and post-win head check
    runAppendStress("fuzz_race_cas",
      pointer = Some(graft.write.FileConditionalStore.open(
        java.nio.file.Files.createTempDirectory("graft_fuzz_race_store").toString)))
  }

  test("shallow-clone lifecycle under adversarial source maintenance (seed 3)") {
    val rnd = new scala.util.Random(3L)
    val src = new SnapshotTable(spark, freshRoot("fuzz_src"))
    val init = randBatch(rnd, 5)
    var srcModel: MS = ms(init)
    src.commitOverwrite(toDF(init))
    val b0 = randBatch(rnd, 3).distinctBy(_._1)
    src.commitMerge(toDF(b0), Seq("id")) // COW only: keeps source purge-eligible
    srcModel = add(removeWhere(srcModel, r => b0.map(_._1).toSet(r._1)), b0)

    val cl = src.shallowClone(freshRoot("fuzz_clone"))
    var clModel: MS = srcModel

    // both sides keep mutating while the source runs immediate-window
    // retention: the borrow lease is the only thing keeping the
    // clone's borrowed dirs alive
    for (i <- 1 to 9) {
      val sb = randBatch(rnd, 1 + rnd.nextInt(3))
      src.commitAppend(toDF(sb)); srcModel = add(srcModel, sb)
      rnd.nextInt(3) match {
        case 0 =>
          val cb = randBatch(rnd, 1 + rnd.nextInt(3))
          cl.commitAppend(toDF(cb)); clModel = add(clModel, cb)
        case 1 =>
          val cb = randBatch(rnd, 1 + rnd.nextInt(3)).distinctBy(_._1)
          val ks = cb.map(_._1).toSet
          cl.commitMerge(toDF(cb), Seq("id"))
          clModel = add(removeWhere(clModel, r => ks(r._1)), cb)
        case _ =>
          val (c, p) = randCond(rnd)
          cl.commitDelete(c); clModel = removeWhere(clModel, p)
      }
      if (i % 3 == 0) {
        src.expire(keepLast = 1, olderThanMs = 0L)
        src.vacuum(olderThanMs = 0L)
        assert(msOf(src.read()) == srcModel, s"round $i: source diverged")
        assert(msOf(cl.read()) == clModel,
          s"round $i: clone diverged after source expire+vacuum — " +
            "a borrowed dir was reclaimed out from under the lease")
      }
    }

    // purge refuses on BOTH sides while the borrow is live
    val srcRefusal = intercept[IllegalArgumentException] {
      src.purge(col("id") === -1)
    }
    assert(srcRefusal.getMessage.contains("live shallow clone"))
    val clRefusal = intercept[IllegalArgumentException] {
      cl.purge(col("id") === -1)
    }
    assert(clRefusal.getMessage.toLowerCase.contains("localize"))

    cl.localize(olderThanMs = 0L)
    assert(msOf(cl.read()) == clModel, "localize changed the clone's state")
    assert(cl.fsck().isEmpty, s"clone fsck after localize: ${cl.fsck()}")

    // lease released: source retention and purge proceed, and the
    // now-self-owned clone is untouched by either
    src.expire(keepLast = 1, olderThanMs = 0L)
    src.vacuum(olderThanMs = 0L)
    src.purge(col("id") === -1)
    assert(msOf(src.read()) == srcModel, "source diverged after purge")
    assert(msOf(cl.read()) == clModel,
      "clone diverged after post-localize source maintenance")
    assert(src.fsck().isEmpty, s"source fsck: ${src.fsck()}")
  }
}
