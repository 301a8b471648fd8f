package graft.catalog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-persisted table identity: a durable name → (path, format)
  * registry stored UNDER the warehouse directory itself, so two
  * sequential (or concurrent, see below) sessions pointed at the same
  * warehouse resolve the same table names — the piece of metastore
  * behavior the reference gets from its Hive Metastore + Iceberg
  * catalog (`dbt/profiles.yml:10–11`,
  * `scripts/nyc_taxi/ingest_spark_bulk.py:42–45`) and Spark's default
  * in-memory catalog loses on session exit.
  *
  * Layout: one entry file per table at
  * `<warehouse>/_graft_catalog/<namespace>/<table>` holding
  * `path=<location>` / `format=<fmt>` lines. Registration writes a
  * per-attempt-unique temp file and flips it into place with an
  * OVERWRITE-capable rename (POSIX `rename(2)` on local filesystems,
  * `FileContext` + `Options.Rename.OVERWRITE` on HDFS-class stores —
  * one atomic step either way, the [[graft.write.SnapshotTable]]
  * commit-protocol contract), so a reader never observes a half-written
  * OR transiently-missing entry, even mid-re-registration;
  * last-writer-wins on re-register, which is the metastore's own
  * semantics for `ALTER TABLE SET LOCATION`. Entry files are
  * metadata-sized (two lines), so listing a namespace is O(tables),
  * never O(data).
  *
  * This deliberately stores LOCATIONS, not data: dropping a name leaves
  * the files (an EXTERNAL table drop). Pair with [[graft.write
  * .SnapshotTable]] at the location for versioned data under a durable
  * name. */
class PathCatalog(spark: SparkSession, warehouse: String) {
  private val root = new Path(warehouse, "_graft_catalog")
  // Entry files bypass ChecksumFileSystem's .crc shadows: the shadow is
  // a SECOND file, and two files cannot flip atomically — a reader
  // racing a re-register would hit transient checksum mismatches. Raw
  // access keeps the whole entry in one inode; corruption protection
  // for a two-line metadata file is the flip's atomicity itself.
  private val fs: FileSystem = {
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
  }

  private def check(id: String): String = {
    require(id.nonEmpty && id.forall(c => c.isLetterOrDigit || c == '_'),
      s"identifier must be [A-Za-z0-9_]+: '$id'")
    id
  }

  private def entryPath(ns: String, table: String) =
    new Path(new Path(root, check(ns)), check(table))

  /** Durably bind `ns.table` to a data location (external-table CTAS
    * registration). Re-registering overwrites: last writer wins. */
  def register(ns: String, table: String, location: String,
               format: String = "parquet"): Unit = {
    // the entry file is line-framed; a newline in either value would
    // silently corrupt the record a later session resolves
    require(!location.contains('\n') && !location.contains('\r'),
      s"location must be newline-free: '$location'")
    require(format.nonEmpty && format.forall(c => c.isLetterOrDigit || c == '-'),
      s"format must be a simple token: '$format'")
    // overwrite-capable rename ([[graft.util.AtomicFlip]]): ONE atomic
    // flip, so a concurrent resolve sees either the old entry or the
    // new one — never the unbound window a delete-then-rename pair
    // opens; unique temp per attempt, so two racing registers never
    // share a staging file; the legacy `.table.crc` shadow a previous
    // checksummed writer left behind is cleaned after the flip (a stale
    // shadow would fail any reader still routing through
    // ChecksumFileSystem with a checksum mismatch).
    graft.util.AtomicFlip.writeAtomic(fs,
      spark.sparkContext.hadoopConfiguration, entryPath(ns, table),
      s"path=$location\nformat=$format\n".getBytes("UTF-8"))
  }

  /** Resolve a name to its (location, format), if registered — works
    * from ANY session handle over the same warehouse dir. An absent
    * entry returns None immediately (the flip is atomic, so "missing"
    * is a real answer, not a race); a READ error retries bounded — a
    * defensive net for stores whose register() had to take the
    * documented delete+rename fallback. */
  def resolve(ns: String, table: String): Option[(String, String)] = {
    val p = entryPath(ns, table)
    var attempt = 0
    while (true) {
      if (!fs.exists(p)) return None
      try {
        val in = fs.open(p)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val kv = text.linesIterator.filter(_.contains("="))
          .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
          .toMap
        return Some((kv("path"), kv.getOrElse("format", "parquet")))
      } catch {
        case e: java.io.IOException if attempt < 5 =>
          attempt += 1
          Thread.sleep(2L << attempt)
      }
    }
    None // unreachable
  }

  /** Read a registered table through its resolved location. */
  def read(ns: String, table: String): DataFrame = {
    val (loc, fmt) = resolve(ns, table)
      .getOrElse(sys.error(s"no such table: $ns.$table under $warehouse"))
    spark.read.format(fmt).load(loc)
  }

  /** Tables registered under a namespace, sorted. */
  def list(ns: String): Seq[String] = {
    val d = new Path(root, check(ns))
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filterNot(_.startsWith("._")).sorted.toSeq
  }

  /** Unbind the name (external-table drop: data files stay). */
  def drop(ns: String, table: String): Unit =
    fs.delete(entryPath(ns, table), false)
}
