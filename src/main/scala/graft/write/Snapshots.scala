package graft.write

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned table over plain partitioned parquet — the
  * capability the reference inherits from Iceberg for free (every write
  * is a snapshot commit, `scripts/nyc_taxi/ingest_spark_bulk.py:146–152`;
  * `trino/catalog/iceberg.properties:13–14` pins the catalog that makes
  * `rollback_to_snapshot` a one-liner). Graft's in-place writers
  * ([[IncrementalWriter]]) have no versioned recovery: a bad load is
  * permanent. This class adds the Iceberg-shaped contract with a
  * manifest-file design:
  *
  *  - Data is IMMUTABLE: every commit writes a fresh
  *    `_data/d<version>` directory; nothing ever rewrites history.
  *  - A manifest (`_manifests/v<version>.txt`) lists the data
  *    directories composing that snapshot, each with an excluded
  *    partition set (how dynamic partition overwrite masks replaced
  *    months without touching their files).
  *  - `_manifests/CURRENT` names the live version; readers resolve it,
  *    writers flip it last. The flip is a temp-file + atomic rename.
  *  - [[rollbackTo]] is ITSELF a commit whose entries are the target
  *    version's — history is preserved (Iceberg semantics), data moves
  *    zero bytes, and the rollback is visible in [[history]].
  *
  * Commit protocol (optimistic, single-winner): data dir first
  * (invisible until referenced), then the manifest created with
  * `overwrite = false` — the filesystem's atomic create-exclusive is the
  * commit point, so two writers racing to version N+1 produce exactly
  * one winner and one [[SnapshotConflictException]] (retry = re-read
  * CURRENT, re-commit as N+2) — then the CURRENT flip. A crash between
  * manifest create and CURRENT flip leaves an orphan manifest that
  * blocks the next commit; [[repair]] re-points CURRENT at the newest
  * complete manifest, mirroring how a catalog recovers.
  *
  * This holds on filesystems with atomic create/rename (HDFS, local,
  * most POSIX). On S3-class object stores create-exclusive is not
  * atomic; production tables there put the version pointer in a catalog
  * with a conditional write (what Iceberg's HMS/REST catalogs do) and
  * keep everything else here unchanged. The constructor PROBES the
  * root's scheme and refuses known non-atomic stores with a clear error
  * (opt back in via `graft.snapshots.allow.nonatomic=true` once the
  * pointer lives in such a catalog) — fail-fast at open beats a
  * silently unsafe flip under concurrency.
  *
  * At 100 TB the unit of work per commit is one data directory's write:
  * commit metadata is O(retained versions × data dirs), never O(files),
  * and rollback/time-travel never rewrite data. [[expire]] bounds the
  * retained history like Iceberg's `expire_snapshots`.
  */
class SnapshotTable(spark: SparkSession, root: String,
                    partCols: Seq[String] = Seq("year", "month")) {
  require(partCols.nonEmpty, "partCols must be non-empty")

  /** The table's root directory — what a catalog entry records. */
  def location: String = root

  private val manifestDir = new Path(root, "_manifests")
  private val dataDir = new Path(root, "_data")
  private val statsDir = new Path(root, "_stats")
  private val fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Commit-safety probe (fail-fast at OPEN, not corrupt at commit): the
  // protocol's two primitives — create-exclusive as the commit point and
  // atomic rename as the pointer flip — do not exist on S3-class object
  // stores (rename there is copy+delete; create is last-writer-wins), so
  // two racing writers would BOTH believe they won and the CURRENT flip
  // could be observed half-complete. The reference runs its warehouse on
  // MinIO/S3 but gets safety from an Iceberg CATALOG's conditional
  // write, not from the store (`trino/catalog/iceberg.properties`,
  // `scripts/nyc_taxi/ingest_spark_bulk.py:123–133`); the equivalent
  // deployment here keeps the pointer in such a catalog and sets
  // `graft.snapshots.allow.nonatomic=true` to acknowledge the contract
  // moved off the filesystem.
  {
    val scheme = Option(new Path(root).toUri.getScheme).getOrElse(fs.getScheme)
    val unsafe = Set("s3", "s3a", "s3n", "gs", "oss", "swift", "cos", "wasb")
    val conf = spark.sparkContext.hadoopConfiguration
    require(!unsafe.contains(scheme) ||
        conf.getBoolean("graft.snapshots.allow.nonatomic", false),
      s"SnapshotTable at $root: scheme '$scheme' lacks atomic rename/" +
        "create-exclusive, so the commit protocol cannot guarantee a " +
        "single winner. Point the version pointer at a conditional-write " +
        "catalog and set graft.snapshots.allow.nonatomic=true, or use an " +
        "HDFS/POSIX-semantics filesystem.")
  }

  /** One data directory + the partitions masked out of it (a dynamic
    * partition overwrite excludes the replaced partitions from every
    * OLDER dir instead of deleting their files). Partition values render
    * as colon-joined strings, entries as `dir|p1,p2`. */
  private case class Entry(dir: String, excluded: Set[Seq[String]])
  private case class Manifest(version: Int, parent: Int, op: String,
                              entries: Seq[Entry])

  // ---- manifest serialization (line format: trivially greppable and
  // parseable with zero dependencies; values are ints, dir names, and
  // partition-value tuples, none of which need escaping) ----

  private def manifestPath(v: Int) = new Path(manifestDir, f"v$v%05d.txt")

  private def render(m: Manifest): String = {
    val lines = Seq(s"version=${m.version}", s"parent=${m.parent}", s"op=${m.op}") ++
      m.entries.map(e =>
        s"entry=${e.dir}|${e.excluded.map(_.mkString(":")).toSeq.sorted.mkString(",")}")
    lines.mkString("", "\n", "\n")
  }

  private def parse(v: Int): Manifest = {
    val in = fs.open(manifestPath(v))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val kv = text.linesIterator.filter(_.nonEmpty).toSeq.map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
    }
    def one(k: String) = kv.collectFirst { case (`k`, v0) => v0 }
      .getOrElse(sys.error(s"manifest v$v missing $k"))
    val entries = kv.collect { case ("entry", spec) =>
      val bar = spec.indexOf('|')
      val excl = spec.substring(bar + 1).split(",").filter(_.nonEmpty)
        .map(_.split(":").toSeq).toSet
      Entry(spec.substring(0, bar), excl)
    }
    Manifest(one("version").toInt, one("parent").toInt, one("op"), entries)
  }

  // ---- pointer ----

  private val currentPath = new Path(manifestDir, "CURRENT")

  /** The live version, if the table exists. */
  def currentVersion: Option[Int] =
    if (!fs.exists(currentPath)) None
    else {
      val in = fs.open(currentPath)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }

  private def flipCurrent(v: Int): Unit = {
    val tmp = new Path(manifestDir, s"CURRENT.tmp")
    fs.delete(tmp, false)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(currentPath, false) // rename-over is not portable; delete first
    require(fs.rename(tmp, currentPath), s"CURRENT flip to v$v failed")
  }

  // ---- commits ----

  private def writeData(df: DataFrame, version: Int): String = {
    val dir = f"d$version%05d"
    // co-locate each output partition's rows: 1 file per partition, not
    // N_tasks × N_partitions small files (same rationale as
    // IncrementalWriter.byPartition)
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(new Path(dataDir, dir).toString)
    dir
  }

  private def commit(op: String, entries: Seq[Entry]): Int = {
    val parent = currentVersion.getOrElse(0)
    val next = parent + 1
    fs.mkdirs(manifestDir)
    val m = Manifest(next, parent, op, entries)
    val out =
      try fs.create(manifestPath(next), /*overwrite=*/ false)
      catch { case _: java.io.IOException =>
        throw new SnapshotConflictException(
          s"commit of v$next lost the race (or an orphan manifest exists — " +
            s"run repair()): ${manifestPath(next)}")
      }
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
    flipCurrent(next)
    next
  }

  /** Full-table snapshot (CTAS / dbt `table` materialization shape).
    * `opTag` rides the manifest's op line — a caller-visible marker in
    * [[history]] that survives restarts, which is how the streaming IVM
    * loop records its last-applied batch id WITH the state it produced
    * (one durable object, no second file to fall out of sync). */
  def commitOverwrite(df: DataFrame, opTag: String = "overwrite"): Int = {
    require(opTag.nonEmpty && !opTag.exists(c => c == '\n' || c == '\r'),
      s"opTag must be a non-empty single line: '$opTag'")
    val v = currentVersion.getOrElse(0) + 1
    commit(opTag, Seq(Entry(writeData(df, v), Set.empty)))
  }

  /** Append snapshot: previous entries plus one new directory. */
  def commitAppend(df: DataFrame): Int = {
    val v = currentVersion.getOrElse(0) + 1
    val prev = currentVersion.map(x => parse(x).entries).getOrElse(Seq.empty)
    commit("append", prev :+ Entry(writeData(df, v), Set.empty))
  }

  /** Dynamic partition overwrite as a snapshot: the partitions present
    * in `df` are masked out of every older entry (their files stay on
    * disk for time travel) and the new directory carries their
    * replacement — the reference's ingest overwrite mode
    * (`ingest_spark_bulk.py:71–81`) with history. */
  def commitOverwritePartitions(df: DataFrame): Int = {
    val touched: Set[Seq[String]] = df
      .select(partCols.map(c => col(c).cast("string")): _*)
      .distinct().collect().map(r => partCols.indices.map(r.getString)).toSet
    require(touched.nonEmpty, "batch has no partitions")
    val v = currentVersion.getOrElse(0) + 1
    val prev = currentVersion.map(x => parse(x).entries).getOrElse(Seq.empty)
    val masked = prev.map(e => e.copy(excluded = e.excluded ++ touched))
    commit("overwrite_partitions", masked :+ Entry(writeData(df, v), Set.empty))
  }

  // ---- clustered commits with a commit-time stats index (the
  // Iceberg-style composition of the two metadata pieces this engine
  // ships separately: snapshot versioning over immutable data dirs +
  // file-level min/max skipping). Each clustered commit range-clusters
  // its data dir on `clusterCol` (disjoint per-file ranges — the
  // skipping precondition) and builds the per-file (min, max) index for
  // that dir WHILE the rows are hot, so every later read prunes files
  // at planning time without a separate index build. Clustered and
  // hive-partitioned commit styles are alternatives, not mixable: the
  // clustered layout has no partition directories for
  // commitOverwritePartitions' exclusion masks to name. ----

  private def statsPath(dir: String, column: String): Path =
    new Path(new Path(statsDir, dir), column)

  /** Full-table clustered snapshot: data range-clustered on
    * `clusterCol` into `nFiles` disjoint-range files + the dir's stats
    * index, one commit. */
  def commitOverwriteClustered(df: DataFrame, clusterCol: String,
                               nFiles: Int = 8): Int = {
    val v = currentVersion.getOrElse(0) + 1
    commit("overwrite_clustered", Seq(writeClustered(df, v, clusterCol, nFiles)))
  }

  /** Append a clustered data dir (its own stats index) to the current
    * snapshot's entries. */
  def commitAppendClustered(df: DataFrame, clusterCol: String,
                            nFiles: Int = 8): Int = {
    val v = currentVersion.getOrElse(0) + 1
    val prev = currentVersion.map(x => parse(x).entries).getOrElse(Seq.empty)
    commit("append_clustered", prev :+ writeClustered(df, v, clusterCol, nFiles))
  }

  private def writeClustered(df: DataFrame, version: Int, clusterCol: String,
                             nFiles: Int): Entry = {
    val dir = f"d$version%05d"
    val dataP = new Path(dataDir, dir).toString
    IncrementalWriter.overwriteClustered(df, dataP, clusterCol, nFiles)
    graft.sources.DataSkipping.buildStats(spark, dataP, clusterCol,
      statsPath(dir, clusterCol).toString)
    Entry(dir, Set.empty)
  }

  /** Read the CURRENT snapshot through each data dir's stats index:
    * predicates on `clusterCol` prune non-overlapping files per dir at
    * planning time, before any footer opens — the versioned-table read
    * path a selective query wants at 100 TB. A dir committed without a
    * `clusterCol` index reads plain (conservative); results always
    * equal [[read]]'s. */
  def readSkipping(clusterCol: String): DataFrame = {
    val m = parse(currentVersion.getOrElse(sys.error(s"no snapshot at $root")))
    require(m.entries.nonEmpty, s"current snapshot at $root is empty")
    require(m.entries.forall(_.excluded.isEmpty),
      "readSkipping covers clustered-commit tables; this snapshot has " +
        "partition-exclusion masks — read() instead")
    m.entries.map { e =>
      val dataP = new Path(dataDir, e.dir).toString
      val sp = statsPath(e.dir, clusterCol)
      if (fs.exists(sp))
        graft.sources.DataSkipping.read(spark, dataP, clusterCol, sp.toString)
      else spark.read.parquet(dataP)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  // ---- write–audit–publish (the Iceberg WAP workflow): a batch lands
  // in `_data` with NO manifest referencing it — invisible to every
  // reader — gets audited as the WOULD-BE table state, and only then
  // becomes a commit. A failed audit just abandons the dir, which
  // [[vacuum]] already collects as ordinary unreferenced debris. ----

  /** Stage an append invisibly: the data dir is written (partitioned,
    * same layout as a real append) but referenced by nothing. `name`
    * keys the staged dir (`w_<name>`); staging an existing name fails
    * loudly (parquet errorifexists) rather than silently merging. */
  def stageAppend(df: DataFrame, name: String): String = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"stage name must be [A-Za-z0-9_]+: '$name'")
    val dir = s"w_$name"
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).parquet(new Path(dataDir, dir).toString)
    dir
  }

  /** The would-be state if `stagedDir` published now: current snapshot
    * plus the staged rows — what the audit step queries. Readable even
    * before any commit exists (a first-load audit). */
  def readWithStaged(stagedDir: String): DataFrame = {
    val staged = spark.read.option("mergeSchema", "true")
      .parquet(new Path(dataDir, stagedDir).toString)
    currentVersion.map(readVersion)
      .map(_.unionByName(staged, allowMissingColumns = true))
      .getOrElse(staged)
  }

  /** Publish a staged dir as a real append commit — zero data movement
    * (the bytes are already in `_data`); the manifest flip is the only
    * thing the audit gate defers. */
  def publishStaged(stagedDir: String): Int = {
    require(fs.exists(new Path(dataDir, stagedDir)),
      s"no staged dir '$stagedDir' under $dataDir (abandoned or never staged)")
    val prev = currentVersion.map(x => parse(x).entries).getOrElse(Seq.empty)
    require(!prev.exists(_.dir == stagedDir), s"'$stagedDir' is already published")
    commit("publish_append", prev :+ Entry(stagedDir, Set.empty))
  }

  // ---- named refs (Iceberg tags): immutable name → version pointers,
  // retained through expire like Iceberg's ref-aware expire_snapshots ----

  private def tagPath(name: String) = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"tag name must be [A-Za-z0-9_]+: '$name'")
    new Path(manifestDir, s"TAG_$name")
  }

  /** Pin `name` to an existing version. Tags are IMMUTABLE (re-tagging
    * an existing name fails — create-exclusive, same primitive as the
    * commit point); [[expire]] retains tagged versions. */
  def tag(name: String, v: Int): Unit = {
    parse(v) // must exist
    val out =
      try fs.create(tagPath(name), /*overwrite=*/ false)
      catch { case _: java.io.IOException =>
        throw new IllegalArgumentException(
          s"tag '$name' already exists (tags are immutable; pick a new name)")
      }
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The version a tag pins, if the tag exists. */
  def resolveTag(name: String): Option[Int] = {
    val p = tagPath(name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  /** Time travel by name. */
  def readTag(name: String): DataFrame =
    readVersion(resolveTag(name)
      .getOrElse(sys.error(s"no tag '$name' at $root")))

  /** All tags, (name, version), sorted by name. */
  def tags: Seq[(String, Int)] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("TAG_") => n.stripPrefix("TAG_") }
      .sorted.toSeq
      .flatMap(n => resolveTag(n).map(n -> _))

  /** Re-point the table at snapshot `v`'s state — a NEW commit with
    * `v`'s entries, zero data movement, history preserved. */
  def rollbackTo(v: Int): Int = {
    val m = parse(v) // throws if expired/never existed
    commit(s"rollback_to_$v", m.entries)
  }

  // ---- reads ----

  /** The live snapshot. */
  def read(): DataFrame =
    readVersion(currentVersion.getOrElse(sys.error(s"no snapshot at $root")))

  /** Time travel: the table exactly as of version `v`. Each data dir is
    * read with its own partition discovery; exclusion predicates sit on
    * partition columns so they prune directories at listing time, and
    * `unionByName(allowMissingColumns)` lets appended batches evolve the
    * schema with typed-null padding (raw-layer contract, see
    * [[IncrementalWriter.readMerged]]). */
  def readVersion(v: Int): DataFrame = {
    val m = parse(v)
    require(m.entries.nonEmpty, s"v$v is an empty snapshot")
    m.entries.map { e =>
      val df = spark.read.option("mergeSchema", "true")
        .parquet(new Path(dataDir, e.dir).toString)
      val excludePred = e.excluded.toSeq
        .map(vals => partCols.zip(vals)
          .map { case (c, x) => col(c).cast("string") === x }
          .reduce(_ && _))
        .reduceOption(_ || _)
      excludePred.fold(df)(p => df.filter(!p))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Change-data capture between two snapshots: every row of `toV` not
    * in `fromV` as an `insert`, every row of `fromV` not in `toV` as a
    * `delete` (Iceberg's incremental-read / changelog surface — what a
    * downstream consumer tails instead of re-reading the table).
    * MULTISET semantics via `exceptAll`: duplicate rows diff by count,
    * and an unchanged row never appears. Both versions must share a
    * schema (align evolved versions first). Scale shape: each direction
    * is one hash-aggregation shuffle over the version pair — no join
    * blowup, no key assumptions. */
  def changelog(fromV: Int, toV: Int): DataFrame = {
    val a = readVersion(fromV)
    val b = readVersion(toV)
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"changelog needs a shared schema between v$fromV and v$toV")
    b.exceptAll(a.select(b.columns.map(col): _*)).withColumn("op", lit("insert"))
      .unionByName(
        a.exceptAll(b.select(a.columns.map(col): _*)).withColumn("op", lit("delete")))
  }

  /** CDC consumer — the downstream-materialization side of the
    * [[changelog]] contract: applying `changelog(from, to)` to
    * `readVersion(from)` reproduces `readVersion(to)` as a multiset
    * (delete rows removed occurrence-for-occurrence via `exceptAll`,
    * insert rows appended). This is how a derived table at another
    * site/engine follows a snapshot table incrementally instead of
    * re-reading it. Two hash-agg shuffles (the exceptAll), one union. */
  def applyChangelog(base: DataFrame, log: DataFrame): DataFrame = {
    val cols = base.columns
    require(log.columns.contains("op"), "changelog frame must carry an op column")
    val del = log.filter(col("op") === "delete").select(cols.map(col): _*)
    val ins = log.filter(col("op") === "insert").select(cols.map(col): _*)
    base.exceptAll(del).unionByName(ins)
  }

  /** (version, op, parent) for every retained snapshot, oldest first. */
  def history: Seq[(Int, String, Int)] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .sorted.toSeq
      .map { v => val m = parse(v); (m.version, m.op, m.parent) }

  /** Expire history: keep the newest `keepLast` snapshots, delete older
    * manifests and any data directory no retained snapshot references —
    * Iceberg's `expire_snapshots`, the operation that stops a daily
    * 100 TB pipeline's storage growing without bound. The live version
    * and every TAGGED version are always retained (Iceberg's ref-aware
    * expire: a tag is a promise the snapshot stays readable). */
  def expire(keepLast: Int): Unit = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val versions = history.map(_._1)
    val cur = currentVersion.getOrElse(return)
    val keep = versions.sorted.takeRight(keepLast).toSet + cur ++ tags.map(_._2)
    val dead = versions.filterNot(keep)
    val referenced = keep.toSeq.flatMap(v => parse(v).entries.map(_.dir)).toSet
    dead.foreach(v => fs.delete(manifestPath(v), false))
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).map(_.getPath).foreach { p =>
        if (!referenced(p.getName)) {
          fs.delete(p, true)
          // a clustered dir's stats index dies with its data dir
          fs.delete(new Path(statsDir, p.getName), true)
        }
      }
  }

  /** Remove ORPHAN data directories — `_data/d*` dirs referenced by no
    * retained manifest, the debris a writer crashed between data write
    * and manifest create leaves behind (`expire` only collects dirs
    * that WERE referenced). Never touches a referenced dir, so it is
    * safe to run any time; this is Delta's `VACUUM` for the
    * invisible-write case. Returns the removed dir names. */
  def vacuum(): Seq[String] = {
    if (!fs.exists(dataDir)) return Seq.empty
    val referenced = history.map(_._1)
      .flatMap(v => parse(v).entries.map(_.dir)).toSet
    val orphans = fs.listStatus(dataDir).map(_.getPath)
      .filterNot(p => referenced(p.getName)).toSeq
    orphans.foreach { p =>
      fs.delete(p, true)
      fs.delete(new Path(statsDir, p.getName), true)
    }
    orphans.map(_.getName)
  }

  /** Deep clone: copy the whole table (manifests + data) to `destRoot`
    * and return a table handle over the copy — the `CREATE TABLE ...
    * CLONE` shape (Delta/Snowflake). DEEP (files duplicated) so the
    * clone's lifecycle is fully independent: expiring or corrupting the
    * clone can never delete a data directory the source still
    * references, which is the shallow-clone hazard. Cost is one
    * filesystem copy of the referenced bytes — no Spark job, no
    * recompute of the commits that built the source. */
  def deepClone(destRoot: String): SnapshotTable = {
    val dst = new Path(destRoot)
    val dfs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dfs.exists(dst)) dfs.delete(dst, true)
    dfs.mkdirs(dst.getParent)
    require(org.apache.hadoop.fs.FileUtil.copy(fs, new Path(root), dfs, dst,
      /*deleteSource=*/ false, spark.sparkContext.hadoopConfiguration),
      s"deep clone $root -> $destRoot failed")
    new SnapshotTable(spark, destRoot, partCols)
  }

  /** Right-to-be-forgotten erasure: rewrite EVERY retained version so
    * no row matching `condition` survives anywhere in history — the
    * compliance operation time travel makes hard (a DELETE commit only
    * changes the current version; the old manifests still reference the
    * old files). Each referenced data dir is rewritten ONCE (dirs shared
    * across versions pay once, not per version) to a purged twin, every
    * manifest is swapped to reference the twins, and the originals are
    * removed. Version numbers, ops, parents, and partition-exclusion
    * masks are preserved; readers before/after see identical history
    * minus the erased rows. Rows where the condition evaluates NULL are
    * KEPT (erase only what is proven to match). Clustered dirs are
    * re-clustered on their indexed column and their stats indexes
    * rebuilt, so skipping reads keep pruning after the purge.
    *
    * SINGLE-WRITER operation like compaction: it mutates history in
    * place — take the table offline for it (any staged-but-unpublished
    * dirs are vacuumed first: erasure must cover unreferenced bytes
    * too, and a pending stage cannot outrank a deletion request). Cost:
    * one read+write of the referenced bytes (the floor for physical
    * erasure); at 100 TB this is the batch job compliance teams
    * actually schedule, which is why sharing rewritten dirs across
    * versions matters. Returns the number of data dirs rewritten. */
  def purge(condition: org.apache.spark.sql.Column): Int = {
    val versions = history.map(_._1)
    require(versions.nonEmpty, s"no snapshots at $root")
    // erasure must also cover bytes no manifest references — staged
    // (write–audit–publish) and crashed-writer dirs are invisible to
    // readers but still on disk
    vacuum()
    val manifests = versions.map(parse)
    val dirs = manifests.flatMap(_.entries.map(_.dir)).distinct
    val mapping = dirs.map { dir =>
      val purged = s"p$dir"
      val src = new Path(dataDir, dir)
      val dst = new Path(dataDir, purged)
      fs.delete(dst, true)
      val kept = spark.read.option("mergeSchema", "true").parquet(src.toString)
        .filter(!coalesce(condition, lit(false)))
      val dirStats = new Path(statsDir, dir)
      val statCols =
        if (fs.exists(dirStats))
          fs.listStatus(dirStats).map(_.getPath.getName).toSeq.sorted
        else Seq.empty
      if (statCols.nonEmpty) {
        // clustered dir: preserve the layout contract (disjoint ranges
        // on the first indexed column) and rebuild every stats index
        val nFiles = math.max(1, fs.listStatus(src)
          .count(_.getPath.getName.endsWith(".parquet")))
        IncrementalWriter.overwriteClustered(kept, dst.toString, statCols.head, nFiles)
      } else {
        kept.repartition(partCols.map(col): _*)
          .write.partitionBy(partCols: _*).parquet(dst.toString)
      }
      // a dir whose EVERY row matched still needs a schema-bearing
      // (zero-row) file — an empty directory breaks the parquet read of
      // any version referencing it
      val hasData = fs.exists(dst) &&
        fs.listStatus(dst).exists(!_.getPath.getName.startsWith("_"))
      if (!hasData)
        kept.limit(0).coalesce(1).write.mode("overwrite").parquet(dst.toString)
      if (statCols.nonEmpty && hasData)
        statCols.foreach(c => graft.sources.DataSkipping.buildStats(
          spark, dst.toString, c, statsPath(purged, c).toString))
      dir -> purged
    }.toMap
    manifests.foreach { m =>
      val swapped = m.copy(entries = m.entries.map(e => e.copy(dir = mapping(e.dir))))
      val tmp = new Path(manifestDir, s".v${m.version}.purge.tmp")
      fs.delete(tmp, false)
      val out = fs.create(tmp, true)
      try out.write(render(swapped).getBytes("UTF-8")) finally out.close()
      fs.delete(manifestPath(m.version), false)
      require(fs.rename(tmp, manifestPath(m.version)),
        s"manifest swap failed for v${m.version}")
    }
    dirs.foreach { d =>
      fs.delete(new Path(dataDir, d), true)
      fs.delete(new Path(statsDir, d), true)
    }
    mapping.size
  }

  /** Crash recovery: if an orphan manifest exists past CURRENT (a
    * writer died between manifest create and pointer flip), re-point
    * CURRENT at the newest manifest — the write WAS durable, finish it. */
  def repair(): Unit = {
    val latest = history.map(_._1).maxOption
    (latest, currentVersion) match {
      case (Some(l), Some(c)) if l > c => flipCurrent(l)
      case (Some(l), None) => flipCurrent(l)
      case _ => ()
    }
  }
}

/** A second writer committed the same version first — re-read and retry. */
class SnapshotConflictException(msg: String) extends RuntimeException(msg)
