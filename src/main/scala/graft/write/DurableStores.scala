package graft.write

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.util.AtomicFlip

/** Durable [[ConditionalStore]] implementations — the restart-surviving
  * arbiters CAS mode needs to hold real data. [[InMemoryConditionalStore]]
  * is the per-JVM reference cell: correct for tests and single-process
  * runs, but the pointer (and therefore the table) evaporates with the
  * process. The reference deployment's arbiter is a Postgres-backed Hive
  * Metastore on a persistent volume
  * (`/root/reference/docker-compose.yml:105-116`,
  * `trino/catalog/iceberg.properties:3-4`) — these two are the
  * self-contained equivalents:
  *
  *  - [[FileConditionalStore]]: the cell lives as GENERATION FILES in a
  *    directory; `putIf` wins by create-exclusive on the next generation
  *    name — the same protocol Iceberg's `HadoopTableOperations` commits
  *    metadata versions with, built on the exact primitive
  *    ([[AtomicFlip.publishExclusive]]) the Fs commit path already
  *    trusts. Multi-process safe on POSIX/HDFS; refuses object-store
  *    schemes (their create is last-writer-wins — on those, use a
  *    catalog-backed store, which is what CAS mode exists for).
  *
  *  - [[JdbcConditionalStore]]: the cell is a row in any JDBC database;
  *    `putIf` wins by an optimistic-generation conditional UPDATE
  *    (`... WHERE cell = ? AND gen = ?`, row-atomic in every SQL
  *    engine) — the catalog-database shape (HMS/JDBC-catalog class),
  *    provable against the embedded Derby that ships with Spark.
  *
  * Both provide NOTHING beyond the [[ConditionalStore]] contract, so
  * every arbitration property the CAS specs pin holds unchanged.
  */
object DurableStores // scaladoc anchor

/** File-backed conditional store: one logical cell persisted as
  * monotonically numbered generation files `gen_<N>.val` under `dir`.
  *
  * Protocol (lock-free, no lock file to go stale under a crash):
  *
  *  - `get()` = read the HIGHEST generation file's content.
  *  - `putIf(expected, value)` = re-read the highest generation
  *    `(G, cur)`; refuse unless `cur == expected`; then attempt
  *    create-exclusive on `gen_<G+1>.val` with the new value. Exactly
  *    one of N racing writers creates that name — the filesystem is the
  *    arbiter, exactly as in Fs commit mode, so two handles (or two
  *    processes) on the same directory share a single winner per
  *    generation.
  *
  * Crash safety: [[AtomicFlip.publishExclusive]] publishes
  * atomic-with-content (a generation file is never visible torn); a
  * writer crashing BEFORE the publish leaves only a `.tmp` staging file,
  * swept by the winner-side GC below. A crash AFTER the publish IS a
  * completed put — the next reader serves it.
  *
  * GC: each winning put deletes generations more than
  * [[FileConditionalStore.KeepGenerations]] below the new head (and
  * stale `.tmp` staging debris below the same cutoff). A reader that
  * lists head G and races `KeepGenerations` consecutive commits before
  * opening G's file re-lists and retries — bounded, and unreachable in
  * practice at that window size.
  *
  * ABA note: a slow writer that read generation G may attempt
  * `gen_<G+1>` after GC has deleted that name; the create then succeeds
  * but lands BELOW the current head, so no reader ever serves it — it is
  * plain debris for the next GC sweep, never a second winner (`get`
  * always resolves the maximum generation).
  */
class FileConditionalStore(fs: FileSystem, dir: Path,
                           keepGenerations: Int =
                             FileConditionalStore.KeepGenerations)
    extends ConditionalStore {
  require(keepGenerations >= 2,
    s"keepGenerations must be >= 2 (got $keepGenerations): a reader " +
      "needs at least one generation of slack behind the head")

  // same unsafe-scheme refusal as SnapshotTable's commit-safety probe:
  // this store's arbiter IS filesystem create-exclusive, which
  // S3-class stores do not provide — there the pointer belongs in a
  // conditional-write catalog, not in files
  {
    val scheme = Option(dir.toUri.getScheme).getOrElse(fs.getScheme)
    val unsafe =
      Set("s3", "s3a", "s3n", "gs", "oss", "swift", "cos", "wasb", "wasbs")
    require(!unsafe.contains(scheme),
      s"FileConditionalStore at $dir: scheme '$scheme' has no atomic " +
        "create-exclusive, so generation files cannot arbitrate a single " +
        "winner. Back the cell with the deployment's catalog " +
        "(JdbcConditionalStore or a custom ConditionalStore) instead.")
  }

  private val rfs = AtomicFlip.raw(fs)

  private def genPath(g: Long): Path = new Path(dir, f"gen_$g%012d.val")

  // `{12,}` not `{12}`: f"%012d" PADS to twelve digits but renders
  // thirteen past generation 10^12 — an exact-width parse would stop
  // seeing the head there (the same rollover the branch-manifest
  // parser in FsVersionPointer guards with its >= 5 rule)
  private val GenName = "gen_(\\d{12,})\\.val".r
  private val TmpName = "\\.gen_(\\d{12,})\\.val\\.[0-9a-f]{8}\\.tmp".r

  private def listGens(): Seq[Long] =
    if (!rfs.exists(dir)) Seq.empty
    else rfs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case GenName(n) => n.toLong
    }.sorted

  private def readGen(g: Long): Option[String] =
    try {
      val in = rfs.open(genPath(g))
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Highest (generation, value), re-listing if a GC raced the read —
    * each retry means `KeepGenerations` commits landed inside one
    * list-to-open window, so the bound is never hit in practice. */
  private def current(): Option[(Long, String)] = {
    var attempts = 0
    while (attempts < 5) {
      listGens().maxOption match {
        case None => return None
        case Some(g) => readGen(g) match {
          case Some(v) => return Some((g, v))
          case None => attempts += 1
        }
      }
    }
    sys.error(s"FileConditionalStore at $dir: head generation vanished " +
      "5 times in a row — GC churn beyond the retention window " +
      "(raise the keepGenerations constructor parameter or quiesce " +
      "writers)")
  }

  override def get(): Option[String] = current().map(_._2)

  override def putIf(expected: Option[String], value: String): Boolean = {
    val cur = current()
    if (cur.map(_._2) != expected) return false
    val next = cur.map(_._1).getOrElse(0L) + 1L
    val won = AtomicFlip.publishExclusive(fs, genPath(next),
      value.getBytes("UTF-8"))
    if (won) gc(next)
    won
  }

  /** Winner-side sweep: generations (and crashed writers' staging
    * `.tmp` files) more than `keepGenerations` below the just-won
    * head. Best-effort — a failed delete is retried by the next
    * winner. */
  private def gc(head: Long): Unit = {
    val cutoff = head - keepGenerations
    if (cutoff <= 0 || !rfs.exists(dir)) return
    rfs.listStatus(dir).foreach { st =>
      val doomed = st.getPath.getName match {
        case GenName(n) => n.toLong < cutoff
        case TmpName(n) => n.toLong < cutoff
        case _ => false
      }
      if (doomed) {
        try { rfs.delete(st.getPath, false); () }
        catch { case _: java.io.IOException => () }
      }
    }
  }
}

object FileConditionalStore {
  /** Default generations retained behind the head — the race window a
    * reader's list-then-open must fit inside (see
    * [[FileConditionalStore]]); override per store via the
    * constructor. */
  val KeepGenerations = 8

  /** Open (or create) the cell directory at `dir`, resolving the
    * filesystem from the active Spark session's Hadoop configuration
    * when one exists (so `fs.defaultFS` and credentials apply), else a
    * fresh default configuration. */
  def open(dir: String): FileConditionalStore = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    val p = new Path(dir)
    new FileConditionalStore(p.getFileSystem(conf), p)
  }
}

/** JDBC-backed conditional store: the cell is one row of a
  * `graft_cas (cell, gen, val)` table; `putIf` arbitrates through an
  * optimistic-generation conditional UPDATE. The catalog-database
  * deployment shape (the reference arbitrates through a Postgres-backed
  * HMS); tested here against Spark's bundled embedded Derby.
  *
  * Concurrency: `gen` is the server-side token. A put re-reads
  * `(gen, val)`, refuses client-side unless `val == expected`, then
  * issues `UPDATE ... SET gen = gen+1, val = ? WHERE cell = ? AND
  * gen = ?` — single-statement row atomicity (every SQL engine) makes
  * exactly one of N racers match the old generation. First-write races
  * arbitrate through the primary key: one `INSERT` wins, the duplicate
  * loses as a constraint violation mapped to `false`.
  *
  * One handle = one connection; ops on a handle serialize on the
  * handle's monitor (JDBC connections are not thread-safe), but
  * cross-handle races are arbitrated by the database, which is the
  * contract. Close with [[close]] (try-with-resources friendly). */
class JdbcConditionalStore(url: String, cellName: String)
    extends ConditionalStore with AutoCloseable {

  // Derby boots once per JVM and writes derby.log to CWD unless told
  // otherwise; route it to tmp if nothing configured it yet (no-op for
  // non-Derby URLs and for already-booted engines)
  if (System.getProperty("derby.stream.error.file") == null)
    System.setProperty("derby.stream.error.file",
      System.getProperty("java.io.tmpdir") + "/graft_derby.log")

  private val conn = java.sql.DriverManager.getConnection(url)
  conn.setAutoCommit(true)

  // idempotent bootstrap: racing handles may both CREATE — the loser's
  // error is fine iff the table is actually there
  try {
    val st = conn.createStatement()
    try st.executeUpdate(
      "CREATE TABLE graft_cas (" +
        "cell VARCHAR(256) NOT NULL PRIMARY KEY, " +
        "gen BIGINT NOT NULL, " +
        "val CLOB NOT NULL)")
    finally st.close()
  } catch {
    case e: java.sql.SQLException =>
      val probe = conn.createStatement()
      try {
        val rs = probe.executeQuery("SELECT 1 FROM graft_cas WHERE 1=0")
        rs.close() // table exists — the CREATE lost a benign race
      } catch { case _: java.sql.SQLException => throw e }
      finally probe.close()
  }

  private def readRow(): Option[(Long, String)] = {
    val ps = conn.prepareStatement(
      "SELECT gen, val FROM graft_cas WHERE cell = ?")
    try {
      ps.setString(1, cellName)
      val rs = ps.executeQuery()
      try { if (rs.next()) Some((rs.getLong(1), rs.getString(2))) else None }
      finally rs.close()
    } finally ps.close()
  }

  override def get(): Option[String] = synchronized { readRow().map(_._2) }

  override def putIf(expected: Option[String], value: String): Boolean =
    synchronized {
      readRow() match {
        case None =>
          if (expected.isDefined) false
          else {
            val ps = conn.prepareStatement(
              "INSERT INTO graft_cas (cell, gen, val) VALUES (?, 1, ?)")
            try {
              ps.setString(1, cellName); ps.setString(2, value)
              ps.executeUpdate(); true
            } catch {
              // a racing first-writer beat us to the primary key
              case _: java.sql.SQLIntegrityConstraintViolationException => false
              case e: java.sql.SQLException
                  if Option(e.getSQLState).contains("23505") => false
            } finally ps.close()
          }
        case Some((gen, cur)) =>
          if (!expected.contains(cur)) false
          else {
            val ps = conn.prepareStatement(
              "UPDATE graft_cas SET gen = ?, val = ? " +
                "WHERE cell = ? AND gen = ?")
            try {
              ps.setLong(1, gen + 1); ps.setString(2, value)
              ps.setString(3, cellName); ps.setLong(4, gen)
              ps.executeUpdate() == 1
            } finally ps.close()
          }
      }
    }

  override def close(): Unit = synchronized { conn.close() }
}
