package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._

/** FILE-level min/max data skipping — the Delta/Iceberg capability
  * plain parquet directories lack: a persisted per-file stats index
  * consulted at PLANNING time, so a selective predicate on a clustered
  * column reads only the files whose [min, max] ranges overlap it.
  * Parquet's own row-group pruning still needs every file OPENED
  * (footer fetch per file — at 100 TB that is millions of object-store
  * reads per query); file skipping prunes from one metadata-sized index
  * before any file is touched, which is why every table format ships
  * it.
  *
  * Two pieces:
  *  - [[buildStats]] writes the per-file (file, min, max) index for a
  *    column — one scan at index-build time, amortized across every
  *    later query (the trigram/IVF stored-index contract).
  *  - [[read]] returns a DataFrame whose scan resolves through
  *    [[MinMaxFileIndex]]: Catalyst hands the scan's data filters to
  *    the index, which drops every file whose stored range cannot
  *    satisfy them. Pruning is CONSERVATIVE — only simple comparison
  *    conjuncts on the indexed column prune, anything else keeps the
  *    file — so results are always exactly the plain read's.
  *
  * Works on any column whose values embed losslessly in a double
  * (int/long/date/timestamp up to 2^53) — the index stores doubles so
  * one code path covers the numeric families. */
object DataSkipping {

  /** Build + persist the per-file stats index for `column` over the
    * parquet directory `dataPath`. One scan; the index is file-count
    * sized. */
  def buildStats(spark: SparkSession, dataPath: String, column: String,
                 statsPath: String): Unit =
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).cast("double").as("mn"),
        max(col(column)).cast("double").as("mx"))
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath)

  /** Read `dataPath` through the stats index: scans resolve through a
    * [[MinMaxFileIndex]] that prunes non-overlapping files at planning
    * time. */
  def read(spark: SparkSession, dataPath: String, column: String,
           statsPath: String): DataFrame = {
    val stats = spark.read.parquet(statsPath)
      .collect()
      .map(r => normalize(r.getString(0)) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val schema = spark.read.parquet(dataPath).schema
    val index = new MinMaxFileIndex(spark, new Path(dataPath), column, stats)
    // targets the flat clustered-file layout (overwriteClustered); a
    // hive-partitioned root would need the partition columns split out
    // of the data schema — combine with partition pruning instead
    require(index.partitionSchema.isEmpty,
      s"DataSkipping.read expects an unpartitioned layout; $dataPath has " +
        s"partition columns ${index.partitionSchema.fieldNames.mkString(", ")}")
    val relation = HadoopFsRelation(index, index.partitionSchema, schema,
      None, new ParquetFileFormat, Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(relation)
  }

  /** input_file_name() and FileStatus render the same local file as
    * `file:///x` vs `file:/x`; compare by URI path only. */
  private[sources] def normalize(uri: String): String =
    new Path(uri).toUri.getPath

  /** The [lo, hi] interval (+ inclusivity) a conjunct set implies for
    * `column`; files whose stored range sits strictly outside drop.
    * Only top-level comparison conjuncts contribute — disjunctions or
    * expressions over other columns are ignored (conservative). */
  private[sources] def implied(column: String, filters: Seq[Expression]):
      (Option[Double], Option[Double]) = {
    var lo: Option[Double] = None
    var hi: Option[Double] = None
    def tightenLo(v: Double): Unit = if (lo.forall(_ < v)) lo = Some(v)
    def tightenHi(v: Double): Unit = if (hi.forall(_ > v)) hi = Some(v)
    def num(v: Any): Option[Double] = v match {
      case null => None
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case s: Short => Some(s.toDouble)
      case b: Byte => Some(b.toDouble)
      case f: Float => Some(f.toDouble)
      case d: Double => Some(d)
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThan(a: AttributeReference, Literal(v, _)) if a.name == column =>
        num(v).foreach(tightenLo)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if a.name == column =>
        num(v).foreach(tightenLo)
      case LessThan(a: AttributeReference, Literal(v, _)) if a.name == column =>
        num(v).foreach(tightenHi)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if a.name == column =>
        num(v).foreach(tightenHi)
      case EqualTo(a: AttributeReference, Literal(v, _)) if a.name == column =>
        num(v).foreach { x => tightenLo(x); tightenHi(x) }
      case EqualTo(Literal(v, _), a: AttributeReference) if a.name == column =>
        num(v).foreach { x => tightenLo(x); tightenHi(x) }
      case GreaterThan(Literal(v, _), a: AttributeReference) if a.name == column =>
        num(v).foreach(tightenHi)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if a.name == column =>
        num(v).foreach(tightenHi)
      case LessThan(Literal(v, _), a: AttributeReference) if a.name == column =>
        num(v).foreach(tightenLo)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) if a.name == column =>
        num(v).foreach(tightenLo)
      case _ => ()
    }
    filters.foreach(walk)
    (lo, hi)
  }
}

/** File index with per-file min/max pruning on one indexed column.
  * `stats` maps normalized file paths to their stored (min, max);
  * files ABSENT from the index are kept (safe on late-arriving files —
  * rebuild the index to regain their pruning). The strict-inequality
  * boundary is deliberately NOT exploited (a `>` bound prunes like
  * `>=`): boundary files cost one extra read, never a wrong result. */
class MinMaxFileIndex(spark: SparkSession, root: Path, column: String,
                      stats: Map[String, (Double, Double)])
    extends InMemoryFileIndex(spark, Seq(root), Map.empty, None) {

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val (lo, hi) = DataSkipping.implied(column, dataFilters)
    if (lo.isEmpty && hi.isEmpty) base
    else base.map { pd =>
      PartitionDirectory(pd.values, pd.files.filter { f =>
        stats.get(DataSkipping.normalize(f.getPath.toString)) match {
          case Some((mn, mx)) => lo.forall(mx >= _) && hi.forall(mn <= _)
          case None => true
        }
      })
    }
  }
}
