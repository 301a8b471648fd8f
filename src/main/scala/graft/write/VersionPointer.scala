package graft.write

import org.apache.hadoop.fs.{FileSystem, Path}

/** The COMMIT-ARBITRATION seam of [[SnapshotTable]]: who decides, among
  * N racing writers of version v, which one's manifest becomes v — and
  * where the "current version" pointer lives.
  *
  * Two deployments exist (the same pair Iceberg supports):
  *
  *  - [[FsVersionPointer]] (default): the FILESYSTEM arbitrates.
  *    Create-exclusive on a fixed manifest name (`v00007.txt`) is the
  *    commit point; an atomic overwrite-rename keeps the CURRENT
  *    pointer file fresh. Requires atomic create/rename — HDFS, local,
  *    POSIX. This is the round-1..13 protocol, unchanged.
  *
  *  - [[CasVersionPointer]]: a CONDITIONAL-WRITE STORE arbitrates (the
  *    Iceberg HMS/REST-catalog shape — the deployment the reference
  *    actually runs: warehouse bytes on MinIO/S3, version pointer in a
  *    catalog with compare-and-swap,
  *    `/root/reference/trino/catalog/iceberg.properties:13-14`,
  *    `dbt/profiles.yml:4-13`). Manifests are written under
  *    attempt-unique names (`v00007_<uuid>.txt` — plain creates, safe
  *    on S3 because no two writers share a name), and the commit point
  *    is ONE compare-and-swap of the pointer value
  *    `"<version>|<manifestFile>"` keyed on the expected previous
  *    value. Exactly one racing writer wins the CAS; the loser deletes
  *    its manifest file and retries from the new head. Version →
  *    manifest-file resolution for time travel walks the `parentfile=`
  *    chain the pointer records into each manifest (O(retained
  *    versions) metadata reads, the same class as `history()`).
  *
  * What CAS mode does NOT move off the filesystem: branch/tag ref files
  * still use create-exclusive (deploy them on the catalog too before
  * using branches over S3), and [[SnapshotTable.storedPartCols]]'s
  * CURRENT-file probe is Fs-mode only. A table is created and lives in
  * ONE mode; the modes' manifest names are disjoint by construction
  * (fixed vs uuid-suffixed), so opening a table in the wrong mode fails
  * loudly rather than misreading.
  */
private[write] trait VersionPointer {
  /** The live version, if the table exists. */
  def currentVersion(): Option[Int]
  /** Canonical manifest path for a retained version. */
  def manifestPath(v: Int): Path
  /** Publish `content` as version `v`'s manifest (parent `v - 1`).
    * Exactly one racing writer returns true; on true the pointer serves
    * `v`. False = lost the race (or an orphan blocks — see repair). */
  def publish(v: Int, content: Array[Byte]): Boolean
  /** Retained versions, ascending. */
  def versions(): Seq[Int]
  /** Remove version `v`'s manifest (expire path). */
  def delete(v: Int): Unit
  /** Replace version `v`'s manifest content IN PLACE, preserving its
    * identity in the chain (purge path). */
  def rewrite(v: Int, content: Array[Byte]): Unit
  /** Point the pointer at version `v` (crash repair — the CALLER has
    * already validated that v's manifest parses as a durable commit; a
    * torn or foreign manifest file must never be promoted). No-op in
    * modes without a created-but-unflipped window. */
  def promote(v: Int): Unit
  /** Manifest files belonging to NO retained commit — CAS losers that
    * crashed before deleting their attempt. Empty in Fs mode (losers
    * there never create a file: create-exclusive refuses them). The
    * vacuum sweep collects these past the retention window. */
  def orphanManifests(): Seq[Path]
}

/** Filesystem arbitration — the default protocol, exactly as documented
  * on [[SnapshotTable]]: create-exclusive commit point on a fixed
  * manifest name, atomic-rename CURRENT pointer, repair() finishes a
  * crashed winner's flip. */
private[write] class FsVersionPointer(fs: FileSystem,
                                      conf: org.apache.hadoop.conf.Configuration,
                                      manifestDir: Path) extends VersionPointer {

  private val currentPath = new Path(manifestDir, "CURRENT")

  override def currentVersion(): Option[Int] =
    if (!fs.exists(currentPath)) {
      // a table with CAS-style manifests (uuid-suffixed names) but no
      // CURRENT file was created under a conditional-write pointer —
      // reading it in Fs mode would silently serve "no table"; refuse
      // with the fix named instead. Only the cold no-CURRENT path pays
      // the listing.
      val casManifests = fs.exists(manifestDir) &&
        fs.listStatus(manifestDir).exists(
          _.getPath.getName.matches("v\\d+_[0-9a-f]{8}\\.txt"))
      if (casManifests) sys.error(
        s"table at $manifestDir was committed under a conditional-write " +
          "pointer (CAS mode): open it with its ConditionalStore " +
          "(new SnapshotTable(spark, root, partCols, Some(store)))")
      None
    } else {
      val in = fs.open(currentPath)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }

  override def manifestPath(v: Int): Path = new Path(manifestDir, f"v$v%05d.txt")

  private def flipCurrent(v: Int): Unit = {
    // monotonic guard: a DELAYED flip (a writer descheduled between its
    // manifest create and this write while a later committer flipped
    // past it) must not regress CURRENT — readers would transiently see
    // an older version and the next committer would hit a spurious
    // conflict. Check-then-write is not atomic, but a lost race here
    // only re-runs the interleaving it guards against, and the next
    // flip/repair heals it; manifests are immutable so no data is ever
    // at risk.
    if (currentVersion().exists(_ >= v)) return
    graft.util.AtomicFlip.writeAtomic(fs, conf, currentPath,
      v.toString.getBytes("UTF-8"))
  }

  override def publish(v: Int, content: Array[Byte]): Boolean = {
    if (!graft.util.AtomicFlip.publishExclusive(fs, manifestPath(v), content))
      return false
    flipCurrent(v)
    true
  }

  override def versions(): Seq[Int] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted.toSeq

  override def delete(v: Int): Unit = fs.delete(manifestPath(v), false)

  override def rewrite(v: Int, content: Array[Byte]): Unit =
    graft.util.AtomicFlip.writeAtomic(fs, conf, manifestPath(v), content)

  override def promote(v: Int): Unit = flipCurrent(v)

  override def orphanManifests(): Seq[Path] = Seq.empty
}

/** The conditional-write primitive [[CasVersionPointer]] arbitrates
  * through — ONE versioned value with compare-and-swap semantics, the
  * contract every Iceberg-class catalog offers (HMS lock+check, REST
  * catalog conditional commit, DynamoDB conditional put, S3
  * If-Match/etag put). Implement it against the deployment's catalog;
  * [[InMemoryConditionalStore]] is the in-process reference
  * implementation (tests, single-driver deployments, and the FakeS3
  * harness — it deliberately provides NOTHING beyond the contract). */
trait ConditionalStore {
  /** The stored value, None when never written. */
  def get(): Option[String]
  /** Set `value` iff the stored value currently equals `expected`
    * (None = must be absent). Atomic; exactly one of N racing callers
    * with the same `expected` succeeds. */
  def putIf(expected: Option[String], value: String): Boolean
}

/** Per-JVM conditional store — a synchronized cell keyed by name.
  * Reference implementation of the [[ConditionalStore]] contract for
  * tests and single-process deployments; a production multi-writer
  * deployment implements the trait against its catalog. */
class InMemoryConditionalStore private (name: String) extends ConditionalStore {
  override def get(): Option[String] =
    InMemoryConditionalStore.synchronized {
      InMemoryConditionalStore.cells.get(name)
    }
  override def putIf(expected: Option[String], value: String): Boolean =
    InMemoryConditionalStore.synchronized {
      if (InMemoryConditionalStore.cells.get(name) == expected) {
        InMemoryConditionalStore.cells(name) = value; true
      } else false
    }
}

object InMemoryConditionalStore {
  private val cells = scala.collection.mutable.Map.empty[String, String]
  /** The store cell named `name` (same name = same cell, process-wide:
    * two table handles on one root share the arbiter, which is the
    * point). */
  def apply(name: String): InMemoryConditionalStore =
    new InMemoryConditionalStore(name)
}

/** Process-wide registry of NAMED [[ConditionalStore]]s — how the
  * SQL/catalog/format surface reaches CAS-mode tables: a store
  * implementation cannot ride a string option, so a deployment
  * registers its catalog-backed store once at session startup
  * (`GraftStores.register("prod", myStore)`) and tables name it —
  * `CREATE TABLE t USING graft OPTIONS (path '...', pointer 'prod')`
  * or `.option("pointer", "prod")` on any format read/write/stream.
  * Every SQL verb (SELECT, DML, maintenance) then arbitrates through
  * the store exactly as the Scala constructor seam does. An
  * unregistered name refuses loudly at open. */
object GraftStores {
  private val stores =
    scala.collection.concurrent.TrieMap.empty[String, ConditionalStore]
  def register(name: String, store: ConditionalStore): Unit =
    stores(name) = store
  def resolve(name: String): Option[ConditionalStore] = stores.get(name)
  def unregister(name: String): Unit = { stores.remove(name); () }
}

/** Conditional-write arbitration: the commit point is a CAS on the
  * pointer value `"<version>|<manifestFile>"`; manifests are
  * attempt-unique files chained by a `parentfile=` line (see the trait
  * scaladoc for the full protocol).
  *
  * Retention caveat: version→file resolution WALKS the chain from the
  * head, so expiring a MIDDLE version (possible when a tag pins
  * something older than the expire window) makes the pinned version
  * unresolvable here even though its manifest file survives — in CAS
  * mode keep retention contiguous (expire by age/count without
  * gap-creating tags), or record tag→file mappings in the same catalog
  * as the pointer. Fs mode has no such constraint (fixed names). */
private[write] class CasVersionPointer(fs: FileSystem,
                                       conf: org.apache.hadoop.conf.Configuration,
                                       manifestDir: Path,
                                       store: ConditionalStore) extends VersionPointer {

  private def parsePointer(raw: String): (Int, String) = {
    val bar = raw.indexOf('|')
    require(bar > 0, s"malformed version pointer: '$raw'")
    (raw.substring(0, bar).toInt, raw.substring(bar + 1))
  }

  private def head(): Option[(Int, String)] = store.get().map(parsePointer)

  override def currentVersion(): Option[Int] = head().map(_._1)

  /** Walk the parentfile chain from the head down to `stopAt` (or the
    * chain's end), returning version → file. O(retained versions)
    * metadata reads; missing files end the walk (expired history). */
  private def chain(stopAt: Int = Int.MinValue): Map[Int, String] = {
    val acc = scala.collection.mutable.Map.empty[Int, String]
    var cur = head()
    while (cur.isDefined) {
      val (v, f) = cur.get
      val p = new Path(manifestDir, f)
      if (!fs.exists(p)) return acc.toMap // expired past here
      acc(v) = f
      if (v <= stopAt) return acc.toMap
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      cur = text.linesIterator.find(_.startsWith("parentfile="))
        .map(l => (v - 1, l.stripPrefix("parentfile=")))
    }
    acc.toMap
  }

  override def manifestPath(v: Int): Path =
    new Path(manifestDir, chain(stopAt = v).getOrElse(v,
      // FileNotFoundException, matching Fs mode's missing-manifest
      // failure shape — callers with expired-history fallbacks
      // (findLatestOp) catch exactly this type
      throw new java.io.FileNotFoundException(
        s"no retained manifest for v$v under $manifestDir " +
          "(expired, or never committed)")))

  override def publish(v: Int, content: Array[Byte]): Boolean = {
    val before = store.get()
    val beforeV = before.map(parsePointer)
    // the caller computed `content` against parent v-1; if the pointer
    // already moved, the race is lost without touching the store
    if (beforeV.map(_._1).getOrElse(0) != v - 1) return false
    val fname = f"v$v%05d" + "_" +
      java.util.UUID.randomUUID.toString.take(8) + ".txt"
    val p = new Path(manifestDir, fname)
    // chain line first, then the manifest body; attempt-unique name, so
    // a plain create is race-free even on last-writer-wins stores
    val chained = beforeV.map { case (_, pf) => s"parentfile=$pf\n" }
      .getOrElse("").getBytes("UTF-8") ++ content
    val out = fs.create(p, false)
    try out.write(chained) finally out.close()
    if (store.putIf(before, s"$v|$fname")) true
    else { fs.delete(p, false); false } // lost: remove our attempt
  }

  override def versions(): Seq[Int] = chain().keys.toSeq.sorted

  override def delete(v: Int): Unit =
    chain(stopAt = v).get(v).foreach(f =>
      fs.delete(new Path(manifestDir, f), false))

  override def rewrite(v: Int, content: Array[Byte]): Unit = {
    val p = manifestPath(v)
    // preserve the chain line — the rewritten manifest keeps its file
    // name and its parent link (purge swaps entry dirs, never lineage)
    val in = fs.open(p)
    val old = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val parentLine = old.linesIterator.find(_.startsWith("parentfile="))
      .map(_ + "\n").getOrElse("")
    graft.util.AtomicFlip.writeAtomic(fs, conf, p,
      parentLine.getBytes("UTF-8") ++ content)
  }

  /** The CAS pointer has no created-but-unflipped window: the CAS IS
    * the commit. A crash before it leaves only an unreferenced manifest
    * file — [[orphanManifests]] surfaces those for the vacuum sweep. */
  override def promote(v: Int): Unit = ()

  override def orphanManifests(): Seq[Path] = {
    if (!fs.exists(manifestDir)) return Seq.empty
    val live = chain().values.toSet
    fs.listStatus(manifestDir).map(_.getPath)
      .filter(p => p.getName.matches("v\\d+_[0-9a-f]{8}\\.txt") &&
        !live(p.getName)).toSeq
  }
}
