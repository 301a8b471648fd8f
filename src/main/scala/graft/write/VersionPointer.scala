package graft.write

import org.apache.hadoop.fs.{FileSystem, Path}

/** The COMMIT-ARBITRATION seam of [[SnapshotTable]]: who decides, among
  * N racing writers of version v, which one's manifest becomes v — and
  * where the "current version" pointer, the named refs (tags), and the
  * branch lineages live.
  *
  * Two deployments exist (the same pair Iceberg supports):
  *
  *  - [[FsVersionPointer]] (default): the FILESYSTEM arbitrates.
  *    Create-exclusive on a fixed manifest name (`v00007.txt`) is the
  *    commit point; an atomic overwrite-rename keeps the CURRENT
  *    pointer file fresh; tags are create-exclusive `TAG_<name>` files
  *    and branch manifests create-exclusive `bv_<name>_NNNNN.txt`
  *    files. Requires atomic create/rename — HDFS, local, POSIX. This
  *    is the round-1..13 protocol, unchanged.
  *
  *  - [[CasVersionPointer]]: a CONDITIONAL-WRITE STORE arbitrates (the
  *    Iceberg HMS/REST-catalog shape — the deployment the reference
  *    actually runs: warehouse bytes on MinIO/S3, version pointer in a
  *    catalog with compare-and-swap,
  *    `/root/reference/trino/catalog/iceberg.properties:13-14`,
  *    `dbt/profiles.yml:4-13`). Manifests are written under
  *    attempt-unique names (`v00007_<uuid>.txt` — plain creates, safe
  *    on S3 because no two writers share a name), and the commit point
  *    is ONE compare-and-swap of the pointer value. The value's FIRST
  *    line is `"<version>|<manifestFile>"`; every named ref (tag pins,
  *    branch heads) rides the SAME value as `ref=<name>|<value>` lines,
  *    so ref creation/drop and branch commits are each one CAS against
  *    the same single arbiter — nothing ref-shaped is ever
  *    create-exclusive on the filesystem (the round-14 gap: a CAS
  *    deployment exists precisely because the store lacks atomic
  *    create-exclusive, so refs must arbitrate through the catalog too,
  *    exactly where Iceberg keeps them). Branch manifests are
  *    attempt-unique files chained by `parentfile=` lines like main's,
  *    with the head recorded in the branch's ref. Version →
  *    manifest-file resolution walks the `parentfile=` chain ONCE per
  *    head value and memoizes (O(retained) metadata reads per head
  *    move, not per call).
  *
  * A table is created and lives in ONE mode; the modes' manifest names
  * are disjoint by construction (fixed vs uuid-suffixed), so opening a
  * table in the wrong mode fails loudly rather than misreading.
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
  /** Replace the RETAINED manifests' contents preserving every
    * version's identity in the chain (the purge path — callers pass
    * the full retained set). Fs mode: one atomic overwrite-rename per
    * manifest. CAS mode: the whole chain is rebuilt COPY-ON-WRITE
    * under fresh attempt-unique names and swapped in with ONE CAS of
    * the head pointer — an in-place overwrite has no atomic primitive
    * on the object stores CAS mode exists for (a racing reader could
    * observe a missing manifest; a crash mid-write could lose it). */
  def rewriteAll(contents: Map[Int, Array[Byte]]): Unit
  /** Point the pointer at version `v` (crash repair — the CALLER has
    * already validated that v's manifest parses as a durable commit; a
    * torn or foreign manifest file must never be promoted). No-op in
    * modes without a created-but-unflipped window. */
  def promote(v: Int): Unit
  /** Manifest files belonging to NO retained commit — CAS losers that
    * crashed before deleting their attempt (main or branch lineages).
    * Empty in Fs mode (losers there never create a file:
    * create-exclusive refuses them). The vacuum sweep collects these
    * past the retention window. */
  def orphanManifests(): Seq[Path]

  // ---- named refs (tags): immutable single-line values arbitrated by
  // the SAME authority as the commit point. Names are namespaced by
  // the caller (`tag/<name>`); values are single-line strings. ----

  /** Create ref `name` = `value` iff absent; exactly one racing
    * creator returns true (tag immutability's primitive). */
  def refCreate(name: String, value: String): Boolean
  /** The ref's value, if it exists. */
  def refGet(name: String): Option[String]
  /** Remove a ref (idempotent). */
  def refDrop(name: String): Unit
  /** All refs, (name, value), unordered. */
  def refList(): Seq[(String, String)]

  // ---- branch lineages: per-name manifest chains with their own
  // single-winner commit point, arbitrated by the same authority. ----

  /** The branch's head branch-version, if the branch exists. */
  def branchHead(name: String): Option[Int]
  /** All branch names. */
  def branchList(): Seq[String]
  /** Manifest path for a retained branch version. */
  def branchManifestPath(name: String, bv: Int): Path
  /** Retained branch versions, ascending. */
  def branchVersions(name: String): Seq[Int]
  /** Publish `content` as branch `name`'s version `bv` (bv = 1
    * creates the branch; bv > 1 extends head bv-1). Exactly one racing
    * writer returns true. */
  def publishBranch(name: String, bv: Int, content: Array[Byte]): Boolean
  /** Remove the whole branch (its manifests and, in CAS mode, its
    * ref). Idempotent. */
  def dropBranch(name: String): Unit
  /** [[rewriteAll]] for one branch's retained manifests (purge). */
  def rewriteBranchAll(name: String, contents: Map[Int, Array[Byte]]): Unit
}

/** Filesystem arbitration — the default protocol, exactly as documented
  * on [[SnapshotTable]]: create-exclusive commit point on a fixed
  * manifest name, atomic-rename CURRENT pointer, repair() finishes a
  * crashed winner's flip. Tags are `TAG_<name>` files; branch
  * manifests are `bv_<name>_NNNNN.txt` files, both create-exclusive. */
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
    // conflict. Check-then-write is not atomic, so the regression can
    // still land; the self-heal below closes it.
    if (currentVersion().exists(_ >= v)) return
    graft.util.AtomicFlip.writeAtomic(fs, conf, currentPath,
      v.toString.getBytes("UTF-8"))
    // self-heal the stale-flip regression: "the next flip heals it"
    // fails when a count-based expire already DELETED the regressed-to
    // version's manifest — CURRENT then points at a phantom, every
    // commit preamble fails parsing it, and no healing flip ever comes
    // (a livelock the concurrent stress fuzz reproduced). After
    // writing, re-list: a newer manifest means our write may have
    // regressed a newer flip — re-flip forward. Each pass strictly
    // advances, so the recursion is bounded by the racer count.
    val newest = versions().maxOption
    if (newest.exists(_ > v)) newest.foreach(flipCurrent)
  }

  override def publish(v: Int, content: Array[Byte]): Boolean = {
    // recreated-slot guard (the Fs-mode analog of the conditional
    // store's recreated-generation guards): a count-based expire
    // DELETES old manifest files, freeing their names — a writer
    // stalled past the retention window could then win
    // create-exclusive on a freed slot and "commit" into history's
    // past: CURRENT never points at it (flipCurrent's monotonic guard
    // skips the flip), so the commit would be silently lost while
    // reporting success, and the orphan file would serve WRONG rows to
    // time travel of the expired version. Pre-check: CURRENT >= v
    // before our create is definitive loss — CURRENT can only reach v
    // through this slot's own manifest, which nobody has created yet —
    // so refuse as an ordinary conflict (the caller recomputes against
    // the new current and retries).
    // (A post-win re-check of CURRENT was considered and rejected: a
    // concurrent conflict-loser's repair() legitimately PROMOTES our
    // just-created manifest and the next commit advances past it, so
    // "CURRENT > v after our create" cannot distinguish a landed
    // commit from a recreated-slot win — acting on it would delete
    // real history. The pre-check plus flipCurrent's self-heal plus
    // expire's head-frontier guard close every persistent path; the
    // residual needs a transiently regressed CURRENT read AND an
    // expired slot AND a win inside the same microsecond window.)
    if (currentVersion().exists(_ >= v)) return false
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

  override def rewriteAll(contents: Map[Int, Array[Byte]]): Unit =
    contents.toSeq.sortBy(_._1).foreach { case (v, content) =>
      // one atomic overwrite-rename per manifest: a reader racing the
      // rewrite sees each version's old or new manifest in full
      graft.util.AtomicFlip.writeAtomic(fs, conf, manifestPath(v), content)
    }

  override def promote(v: Int): Unit = flipCurrent(v)

  override def orphanManifests(): Seq[Path] = Seq.empty

  // ---- refs: TAG_<name> files, the round-1..13 on-disk layout ----

  private def refPath(name: String): Path = {
    // callers namespace tags as `tag/<name>`; the on-disk layout keeps
    // the legacy TAG_ file names so existing tables read unchanged
    require(name.startsWith("tag/"),
      s"Fs-mode refs hold tag pins only (got '$name'); branch heads " +
        "are derived from the branch manifest listing")
    new Path(manifestDir, "TAG_" + name.stripPrefix("tag/"))
  }

  override def refCreate(name: String, value: String): Boolean =
    // atomic-with-content + exclusive, same primitive as the commit
    // point; only the already-exists outcome returns false — a genuine
    // I/O failure propagates as itself from inside the publish
    graft.util.AtomicFlip.publishExclusive(fs, refPath(name),
      value.getBytes("UTF-8"))

  override def refGet(name: String): Option[String] = {
    val p = refPath(name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  override def refDrop(name: String): Unit = { fs.delete(refPath(name), false); () }

  override def refList(): Seq[(String, String)] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("TAG_") =>
        "tag/" + n.stripPrefix("TAG_") }
      .sorted.toSeq
      .flatMap(n => refGet(n).map(n -> _))

  // ---- branches: bv_<name>_NNNNN.txt manifests, heads from listing ----

  private def branchPrefix(name: String): String = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"branch name must be [A-Za-z0-9_]+: '$name'")
    s"bv_${name}_"
  }

  override def branchManifestPath(name: String, bv: Int): Path =
    new Path(manifestDir, f"${branchPrefix(name)}$bv%05d.txt")

  /** The version suffix of a branch manifest name, iff the remainder
    * after the prefix is EXACTLY an all-digit version token of >= 5
    * digits — branch names allow digits and underscores, so `bv_daily_`
    * is a string-prefix of `bv_daily_v2_`'s manifests; a bare
    * startsWith match would hand `branchVersions("daily")` the token
    * `v2_00001` and throw from every maintenance op on the table
    * (vacuum/expire/purge/fsck all walk every branch). The strict-shape
    * parse makes prefix-related names coexist, and it stays unambiguous
    * against a LONGER branch name sharing the prefix: that name's
    * manifests carry an extra `_NNNNN` token, so their suffix contains
    * an underscore and never parses as all digits. `>= 5` (not `== 5`)
    * because `f"%05d"` PADS to five digits but renders six at branch
    * version 100000 — an exact-5 parse would publish that manifest and
    * then never see it again, wedging the branch head at 99999 with
    * every later commit hitting the existing 100000 file. */
  private def branchVersionOf(pre: String, fileName: String): Option[Int] =
    if (!(fileName.startsWith(pre) && fileName.endsWith(".txt"))) None
    else {
      val suffix = fileName.stripPrefix(pre).stripSuffix(".txt")
      if (suffix.length >= 5 && suffix.forall(_.isDigit)) Some(suffix.toInt)
      else None // a longer branch name sharing this prefix — not ours
    }

  override def branchVersions(name: String): Seq[Int] = {
    val pre = branchPrefix(name)
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName)
      .flatMap(branchVersionOf(pre, _))
      .sorted.toSeq
  }

  override def branchHead(name: String): Option[Int] =
    branchVersions(name).maxOption

  override def branchList(): Seq[String] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("bv_") && n.endsWith(".txt") =>
        n.stripPrefix("bv_").stripSuffix(".txt") }
      .flatMap { rest =>
        // name = everything before the trailing _NNNNN version token
        // (names may themselves contain underscores and digits);
        // >= 5 digits for the same 100000-rollover reason as
        // branchVersionOf
        val i = rest.lastIndexOf('_')
        if (i <= 0 || rest.length - i - 1 < 5 ||
            !rest.drop(i + 1).forall(_.isDigit)) None
        else Some(rest.substring(0, i))
      }
      .distinct.sorted.toSeq

  override def publishBranch(name: String, bv: Int, content: Array[Byte]): Boolean = {
    // a branch commit (bv > 1) requires the branch to EXIST: dropBranch
    // frees the bv slot names, so a writer stalled across a concurrent
    // drop would otherwise win create-exclusive on a freed slot and
    // resurrect the dropped branch as a partial lineage with no fork
    // marker (fastForward then dies on it). Same shape as the
    // main-lineage recreated-slot guard; refusing surfaces the drop to
    // the writer as an ordinary conflict whose retry reads "no branch".
    if (bv > 1 && branchHead(name).isEmpty) return false
    graft.util.AtomicFlip.publishExclusive(fs,
      branchManifestPath(name, bv), content)
  }

  override def dropBranch(name: String): Unit =
    branchVersions(name).foreach(bv =>
      fs.delete(branchManifestPath(name, bv), false))

  override def rewriteBranchAll(name: String, contents: Map[Int, Array[Byte]]): Unit =
    contents.toSeq.sortBy(_._1).foreach { case (bv, content) =>
      graft.util.AtomicFlip.writeAtomic(fs, conf,
        branchManifestPath(name, bv), content)
    }
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
// Durable implementations ship in DurableStores.scala:
// [[FileConditionalStore]] (generation-file CAS on POSIX/HDFS — the
// restart-surviving default, auto-opened for path-shaped pointer
// names) and [[JdbcConditionalStore]] (optimistic-generation row in
// any JDBC database — the catalog-database shape).

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
  /** A registered name wins; otherwise an UNAMBIGUOUSLY path-shaped
    * name — an absolute path (`/abs/dir`) or a URI with a scheme
    * (`file:/warehouse/_cas/t1`, `hdfs://...`) — opens a
    * [[FileConditionalStore]] on that directory: the zero-deployment-
    * code durable pointer, `OPTIONS (pointer 'file:/...')` survives JVM
    * restart with nothing registered at startup. Anything else (a
    * relative `team/prod`, a bare name) refuses as unregistered rather
    * than auto-opening: a mistyped registered-store name, or a run
    * whose startup registration was skipped, must fail loudly — a
    * silently-created empty local store directory would quietly fork a
    * new table lineage. The opened store is cached under its name; a
    * benign race opening two is harmless (the filesystem, not the
    * handle, is the arbiter). */
  def resolve(name: String): Option[ConditionalStore] =
    stores.get(name).orElse {
      if (name.startsWith("/") || name.contains(":/"))
        Some(stores.getOrElseUpdate(name, FileConditionalStore.open(name)))
      else None
    }
  def unregister(name: String): Unit = { stores.remove(name); () }
}

/** Conditional-write arbitration: the commit point is a CAS on the
  * pointer value; manifests (main AND branch) are attempt-unique files
  * chained by a `parentfile=` line, refs ride the pointer value's
  * tail lines (see the trait scaladoc for the full protocol).
  *
  * Pointer value layout (single string, the store's one cell):
  * {{{
  *   <version>|<manifestFile>
  *   ref=tag/<name>|<pinnedVersion>
  *   ref=branch/<name>|<branchVersion>|<branchManifestFile>
  * }}}
  * Every mutation — commit, tag create/drop, branch commit — is one
  * CAS of the WHOLE value, so ref mutations and commits serialize
  * against each other; a CAS that fails only because an UNRELATED line
  * moved retries internally against the fresh value (the caller's
  * intent is still valid), so a tag create racing a commit costs one
  * re-read, never a spurious conflict.
  *
  * Retention: [[SnapshotTable.expire]] keeps CAS-mode retention
  * CONTIGUOUS from the head down (a tag pinning an old version pins
  * everything newer too), so the chain walk always resolves every
  * retained version — a mid-chain gap would strand the versions below
  * it. Chain walks are memoized per head value: one O(retained)
  * metadata pass per head move, invalidated by expire/purge. */
private[write] object CasVersionPointer {
  /** Documented ceiling on named refs (tags + branch heads) per
    * CAS-mode table. Every ref is one line of the single pointer value,
    * re-written by every commit CAS and every unrelated-line retry —
    * the bound keeps that value O(10 KB) worst-case so ref bookkeeping
    * can never dominate commit cost; past it, ref creation refuses
    * loudly with the remedy named (see `requireRefCapacity`). */
  val MaxRefs = 256
}

private[write] class CasVersionPointer(fs: FileSystem,
                                       conf: org.apache.hadoop.conf.Configuration,
                                       manifestDir: Path,
                                       store: ConditionalStore) extends VersionPointer {

  // ---- pointer value codec ----

  /** First line's (version, manifestFile). */
  private def parseHead(raw: String): (Int, String) = {
    val line = raw.takeWhile(_ != '\n')
    val bar = line.indexOf('|')
    require(bar > 0, s"malformed version pointer: '$line'")
    (line.substring(0, bar).toInt, line.substring(bar + 1))
  }

  /** Tail lines' refs, name -> value (insertion-ordered). */
  private def parseRefs(raw: String): Seq[(String, String)] =
    raw.linesIterator.drop(1).collect {
      case l if l.startsWith("ref=") =>
        val spec = l.stripPrefix("ref=")
        val bar = spec.indexOf('|')
        require(bar > 0, s"malformed ref line in pointer: '$l'")
        (spec.substring(0, bar), spec.substring(bar + 1))
    }.toSeq

  private def renderValue(head: (Int, String),
                          refs: Seq[(String, String)]): String =
    (s"${head._1}|${head._2}" +:
      refs.map { case (n, v) => s"ref=$n|$v" }).mkString("\n")

  private def head(): Option[(Int, String)] = store.get().map(parseHead)

  override def currentVersion(): Option[Int] = head().map(_._1)

  // ---- chain walks, memoized per head value ----

  /** Diagnostics: full chain walks performed (each is O(retained)
    * metadata reads) — pinned by the memoization spec. */
  private[graft] var chainWalks: Int = 0

  /** Cache key = the exact raw pointer value the walk ran under; a
    * moved head (new raw) misses and re-walks. Explicitly invalidated
    * by [[delete]]/[[rewriteAll]], which change FILES without moving
    * the pointer. Assumes manifests are immutable outside this
    * protocol — the same assumption every reader of them makes. */
  @volatile private var chainCache: Option[(String, Map[Int, String])] = None
  @volatile private var branchChainCache: Map[String, (String, Map[Int, String])] =
    Map.empty

  private def invalidateChains(): Unit = {
    chainCache = None
    branchChainCache = Map.empty
  }

  /** Walk a parentfile chain from (v0, file0) down to its end (or the
    * first missing file — expired history), returning version → file. */
  private def chainFrom(v0: Int, file0: String): Map[Int, String] = {
    chainWalks += 1
    val acc = scala.collection.mutable.Map.empty[Int, String]
    var cur: Option[(Int, String)] = Some((v0, file0))
    while (cur.isDefined) {
      val (v, f) = cur.get
      val p = new Path(manifestDir, f)
      if (!fs.exists(p)) return acc.toMap // expired past here
      acc(v) = f
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      cur = text.linesIterator.find(_.startsWith("parentfile="))
        .map(l => (v - 1, l.stripPrefix("parentfile=")))
    }
    acc.toMap
  }

  /** The main lineage's version → file map (memoized per raw value). */
  private def chain(): Map[Int, String] = store.get() match {
    case None => Map.empty
    case Some(raw) =>
      chainCache match {
        case Some((cachedRaw, m)) if cachedRaw == raw => m
        case _ =>
          val (v, f) = parseHead(raw)
          val m = chainFrom(v, f)
          chainCache = Some((raw, m))
          m
      }
  }

  override def manifestPath(v: Int): Path =
    new Path(manifestDir, chain().getOrElse(v,
      // FileNotFoundException, matching Fs mode's missing-manifest
      // failure shape — callers with expired-history fallbacks
      // (findLatestOp) catch exactly this type
      throw new java.io.FileNotFoundException(
        s"no retained manifest for v$v under $manifestDir " +
          "(expired, or never committed)")))

  /** `putIf` with INDETERMINATE-OUTCOME handling: a real catalog can
    * APPLY the conditional write and then fail reporting it (network
    * drop after commit). Propagating such an exception would make the
    * caller's retry land the same batch TWICE — the
    * commit-state-unknown hazard Iceberg handles by reading back. On
    * any store exception this re-reads: if `attemptFile` is reachable
    * from the fresh head's parentfile chain, OUR commit happened (the
    * attempt name is unique to this call) and the put reports success;
    * otherwise the original failure propagates — still ambiguous, but
    * never silently doubled. */
  private def putIfChecked(expected: Option[String], value: String,
                           attemptFile: String): Boolean =
    try store.putIf(expected, value)
    catch { case e: Throwable =>
      val landed =
        try {
          store.get().map(parseHead).exists { case (hv, hf) =>
            hf == attemptFile || chainFrom(hv, hf).values.exists(_ == attemptFile)
          }
        } catch { case _: Throwable => false }
      if (landed) true else throw e
    }

  override def publish(v: Int, content: Array[Byte]): Boolean = {
    val before = store.get()
    val beforeHead = before.map(parseHead)
    // the caller computed `content` against parent v-1; if the pointer
    // already moved, the race is lost without touching the store
    if (beforeHead.map(_._1).getOrElse(0) != v - 1) return false
    val fname = f"v$v%05d" + "_" +
      java.util.UUID.randomUUID.toString.take(8) + ".txt"
    val p = new Path(manifestDir, fname)
    // chain line first, then the manifest body; attempt-unique name, so
    // a plain create is race-free even on last-writer-wins stores
    val chained = beforeHead.map { case (_, pf) => s"parentfile=$pf\n" }
      .getOrElse("").getBytes("UTF-8") ++ content
    val out = fs.create(p, false)
    try out.write(chained) finally out.close()
    // CAS carrying the refs tail forward; a failure where the HEAD
    // line is unchanged means only a ref moved (tag create, branch
    // commit) — the commit is still valid against parent v-1, so
    // retry against the fresh refs instead of surfacing a spurious
    // conflict (and re-running the caller's whole data write)
    var cur = before
    while (true) {
      if (putIfChecked(cur, renderValue((v, fname),
          cur.map(parseRefs).getOrElse(Seq.empty)), fname))
        return true
      val fresh = store.get()
      if (fresh.map(parseHead) != beforeHead) {
        fs.delete(p, false) // lost the real race: remove our attempt
        return false
      }
      cur = fresh
    }
    false // unreachable
  }

  override def versions(): Seq[Int] = chain().keys.toSeq.sorted

  override def delete(v: Int): Unit = {
    chain().get(v).foreach(f => fs.delete(new Path(manifestDir, f), false))
    invalidateChains()
  }

  override def rewriteAll(contents: Map[Int, Array[Byte]]): Unit = {
    val raw = store.get().getOrElse(return)
    val (headV, _) = parseHead(raw)
    val old = chain()
    if (old.isEmpty) return
    val ordered = old.keys.toSeq.sorted
    // rebuild the retained chain bottom-up under fresh attempt-unique
    // names: each new manifest's parentfile points at its parent's NEW
    // name (the oldest keeps its original parent link — it points past
    // the retention edge, where the walk stops at the missing file
    // anyway). Nothing is overwritten in place: readers keep resolving
    // the OLD chain until the single CAS below swaps the head.
    def readFile(f: String): String = {
      val in = fs.open(new Path(manifestDir, f))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val newNames = scala.collection.mutable.Map.empty[Int, String]
    ordered.foreach { v =>
      val oldText = readFile(old(v))
      val body = contents.get(v).map(new String(_, "UTF-8")).getOrElse(
        oldText.linesIterator.filterNot(_.startsWith("parentfile="))
          .mkString("", "\n", "\n"))
      val parentLine = newNames.get(v - 1) match {
        case Some(pf) => s"parentfile=$pf\n"
        case None => oldText.linesIterator
          .find(_.startsWith("parentfile=")).map(_ + "\n").getOrElse("")
      }
      val fname = f"v$v%05d" + "_" +
        java.util.UUID.randomUUID.toString.take(8) + ".txt"
      val out = fs.create(new Path(manifestDir, fname), false)
      try out.write((parentLine + body).getBytes("UTF-8")) finally out.close()
      newNames(v) = fname
    }
    // one CAS moves every retained version's identity at once; refs
    // carry forward untouched (tag values are bare versions and branch
    // values name BRANCH files — neither references main chain files)
    if (!putIfChecked(Some(raw), renderValue((headV, newNames(headV)),
        parseRefs(raw)), newNames(headV))) {
      newNames.values.foreach(f => fs.delete(new Path(manifestDir, f), false))
      throw new SnapshotConflictException(
        s"manifest rewrite at $manifestDir lost a race with a concurrent " +
          "commit — purge requires a quiesced table; retry when no " +
          "writer is in flight")
    }
    invalidateChains()
    ordered.foreach(v => fs.delete(new Path(manifestDir, old(v)), false))
  }

  /** The CAS pointer has no created-but-unflipped window: the CAS IS
    * the commit. A crash before it leaves only an unreferenced manifest
    * file — [[orphanManifests]] surfaces those for the vacuum sweep. */
  override def promote(v: Int): Unit = ()

  override def orphanManifests(): Seq[Path] = {
    if (!fs.exists(manifestDir)) return Seq.empty
    val live = chain().values.toSet ++
      branchList().flatMap(n => branchChain(n).values)
    fs.listStatus(manifestDir).map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.matches("v\\d+_[0-9a-f]{8}\\.txt") ||
          n.matches("bv_.*_\\d{5,}_[0-9a-f]{8}\\.txt")) && !live(n)
      }.toSeq
  }

  // ---- refs: lines of the pointer value, every mutation one CAS ----

  /** Apply `mutate` to the refs under CAS: retried while OTHER lines
    * move (a concurrent commit relocating the head never invalidates a
    * ref mutation's intent); returns false only when the mutation
    * itself refuses against the fresh refs. `landed` is the
    * indeterminate-outcome check (same hazard as [[putIfChecked]]): on
    * a store exception the fresh refs are read back, and if the
    * mutation's effect is already visible the op reports success
    * instead of letting a retry double it. */
  private def casRefs(landed: Seq[(String, String)] => Boolean)(
      mutate: Seq[(String, String)] => Option[Seq[(String, String)]]): Boolean = {
    while (true) {
      val raw = store.get().getOrElse(sys.error(
        s"no committed version at $manifestDir to hang a ref on"))
      val refs = parseRefs(raw)
      mutate(refs) match {
        case None => return false
        case Some(next) =>
          val won =
            try store.putIf(Some(raw), renderValue(parseHead(raw), next))
            catch { case e: Throwable =>
              val visible =
                try store.get().map(parseRefs).exists(landed)
                catch { case _: Throwable => false }
              if (visible) true else throw e
            }
          if (won) return true
        // else: lost to a concurrent commit or another ref op — re-read
      }
    }
    false // unreachable
  }

  /** Loud refusal keeping the pointer value BOUNDED: every ref line
    * rides the single CAS cell, so each commit (and each unrelated-line
    * retry) re-writes the whole list through the store — unbounded refs
    * would make ref bookkeeping the commit cost at organization scale.
    * Checked inside the CAS loop, so racing creators cannot overshoot. */
  private def requireRefCapacity(refs: Seq[(String, String)]): Unit =
    require(refs.size < CasVersionPointer.MaxRefs,
      s"table at $manifestDir already carries ${refs.size} refs " +
        s"(tags + branches) — the CAS pointer holds at most " +
        s"${CasVersionPointer.MaxRefs}, because every ref rides the one " +
        "arbitration cell that every commit re-writes. Drop unused tags " +
        "(dropTag) or branches (dropBranch) before creating more.")

  override def refCreate(name: String, value: String): Boolean =
    casRefs(_.exists(r => r._1 == name && r._2 == value)) { refs =>
      if (refs.exists(_._1 == name)) None
      else { requireRefCapacity(refs); Some(refs :+ (name -> value)) }
    }

  override def refGet(name: String): Option[String] =
    store.get().flatMap(raw => parseRefs(raw).collectFirst {
      case (`name`, v) => v })

  override def refDrop(name: String): Unit = {
    if (store.get().isEmpty) return
    casRefs(!_.exists(_._1 == name)) { refs =>
      if (!refs.exists(_._1 == name)) None // absent: done (idempotent)
      else Some(refs.filterNot(_._1 == name))
    }
    ()
  }

  override def refList(): Seq[(String, String)] =
    store.get().map(parseRefs).getOrElse(Seq.empty)

  // ---- branches: ref `branch/<name>` = "<bv>|<file>", attempt-unique
  // chained manifests `bv_<name>_<bv>_<uuid>.txt` ----

  private def branchRef(name: String) = s"branch/$name"

  private def parseBranchVal(v: String): (Int, String) = {
    val bar = v.indexOf('|')
    require(bar > 0, s"malformed branch ref value: '$v'")
    (v.substring(0, bar).toInt, v.substring(bar + 1))
  }

  override def branchHead(name: String): Option[Int] =
    refGet(branchRef(name)).map(parseBranchVal(_)._1)

  override def branchList(): Seq[String] =
    refList().collect { case (n, _) if n.startsWith("branch/") =>
      n.stripPrefix("branch/") }.sorted

  /** The branch's bv → file map (memoized per ref value, same contract
    * as the main chain's memo). */
  private def branchChain(name: String): Map[Int, String] =
    refGet(branchRef(name)) match {
      case None => Map.empty
      case Some(v) =>
        branchChainCache.get(name) match {
          case Some((cachedVal, m)) if cachedVal == v => m
          case _ =>
            val (bv, f) = parseBranchVal(v)
            val m = chainFrom(bv, f)
            branchChainCache += (name -> (v, m))
            m
        }
    }

  override def branchManifestPath(name: String, bv: Int): Path =
    new Path(manifestDir, branchChain(name).getOrElse(bv,
      throw new java.io.FileNotFoundException(
        s"no retained manifest for branch '$name'@$bv under $manifestDir")))

  override def branchVersions(name: String): Seq[Int] =
    branchChain(name).keys.toSeq.sorted

  override def publishBranch(name: String, bv: Int, content: Array[Byte]): Boolean = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"branch name must be [A-Za-z0-9_]+: '$name'")
    val cur = refGet(branchRef(name)).map(parseBranchVal)
    // same shape as publish(): the caller computed against head bv-1
    if (cur.map(_._1).getOrElse(0) != bv - 1) return false
    val fname = f"bv_${name}_$bv%05d" + "_" +
      java.util.UUID.randomUUID.toString.take(8) + ".txt"
    val chained = cur.map { case (_, pf) => s"parentfile=$pf\n" }
      .getOrElse("").getBytes("UTF-8") ++ content
    val out = fs.create(new Path(manifestDir, fname), false)
    try out.write(chained) finally out.close()
    // landed-check: the attempt file name is unique to this call, so
    // its presence in the branch's chain proves OUR publish applied
    val won =
      try casRefs(_.collectFirst {
          case (n, v) if n == branchRef(name) => v
        }.exists { v =>
          val (hv, hf) = parseBranchVal(v)
          hf == fname || chainFrom(hv, hf).values.exists(_ == fname)
        }) { refs =>
        val now = refs.collectFirst { case (n, v) if n == branchRef(name) => v }
          .map(parseBranchVal)
        if (now != cur) None // the branch head moved: real race, lost
        else {
          // creating the branch adds a ref line; extending replaces one
          if (now.isEmpty) requireRefCapacity(refs)
          Some(
            refs.filterNot(_._1 == branchRef(name)) :+
              (branchRef(name) -> s"$bv|$fname"))
        }
      } catch { case e: Throwable =>
        fs.delete(new Path(manifestDir, fname), false) // refused: no debris
        throw e
      }
    if (!won) fs.delete(new Path(manifestDir, fname), false)
    won
  }

  override def dropBranch(name: String): Unit = {
    val files = branchChain(name).values.toSeq
    refDrop(branchRef(name))
    files.foreach(f => fs.delete(new Path(manifestDir, f), false))
    branchChainCache -= name
  }

  override def rewriteBranchAll(name: String, contents: Map[Int, Array[Byte]]): Unit = {
    val curVal = refGet(branchRef(name)).getOrElse(return)
    val (headBv, _) = parseBranchVal(curVal)
    val old = branchChain(name)
    if (old.isEmpty) return
    val ordered = old.keys.toSeq.sorted
    def readFile(f: String): String = {
      val in = fs.open(new Path(manifestDir, f))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val newNames = scala.collection.mutable.Map.empty[Int, String]
    ordered.foreach { bv =>
      val oldText = readFile(old(bv))
      val body = contents.get(bv).map(new String(_, "UTF-8")).getOrElse(
        oldText.linesIterator.filterNot(_.startsWith("parentfile="))
          .mkString("", "\n", "\n"))
      val parentLine = newNames.get(bv - 1) match {
        case Some(pf) => s"parentfile=$pf\n"
        case None => oldText.linesIterator
          .find(_.startsWith("parentfile=")).map(_ + "\n").getOrElse("")
      }
      val fname = f"bv_${name}_$bv%05d" + "_" +
        java.util.UUID.randomUUID.toString.take(8) + ".txt"
      val out = fs.create(new Path(manifestDir, fname), false)
      try out.write((parentLine + body).getBytes("UTF-8")) finally out.close()
      newNames(bv) = fname
    }
    val won = casRefs(_.collectFirst {
        case (n, v) if n == branchRef(name) => v
      }.contains(s"$headBv|${newNames(headBv)}")) { refs =>
      val now = refs.collectFirst { case (n, v) if n == branchRef(name) => v }
      if (!now.contains(curVal)) None // branch moved mid-rewrite
      else Some(refs.map { case (n, v) =>
        if (n == branchRef(name)) (n, s"$headBv|${newNames(headBv)}") else (n, v)
      })
    }
    if (!won) {
      newNames.values.foreach(f => fs.delete(new Path(manifestDir, f), false))
      throw new SnapshotConflictException(
        s"branch '$name' manifest rewrite at $manifestDir lost a race — " +
          "purge requires a quiesced table")
    }
    branchChainCache -= name
    ordered.foreach(bv => fs.delete(new Path(manifestDir, old(bv)), false))
  }
}
