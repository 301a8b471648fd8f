package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's synthetic corpus (`TESTDATA.md`):
  * `region nation customer supplier part orders lineitem events documents
  * embeddings`, one parquet per table under `sfDir`.
  *
  * Scans stay plain `spark.read.parquet` so Catalyst keeps full predicate
  * pushdown / column pruning into the parquet reader — at 100 TB that scan
  * pruning is the single biggest lever, so nothing here materializes,
  * caches, or repartitions eagerly.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a scan across the session's cores when the source yields
    * fewer splits than the available parallelism (e.g. one giant parquet
    * row group — unsplittable, so the whole fused codegen stage above it
    * would run on ONE core). The explicit width pins the exchange against
    * AQE re-coalescing. On a healthy multi-file/multi-row-group layout
    * (any real 100 TB table) the guard makes this a no-op, so downstream
    * plans keep plain scan → compute with no extra exchange. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // File-count heuristic from the (already-listed) read relation —
    // df.rdd.getNumPartitions would force a full physical planning pass
    // per call just to read a number. File count lower-bounds the split
    // count (a multi-row-group file yields more splits), so the guard can
    // only over-trigger, and only on few-files inputs where the extra
    // exchange is cheap; on any healthy many-file layout it is a no-op.
    if (df.inputFiles.length >= (target + 1) / 2) df
    else df.repartition(target)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as long ns
    * (via `spark.sql.legacy.parquet.nanosAsLong`). Normalize to a µs
    * TimestampType column so downstream operators and the DuckDB oracle
    * agree (the corpus carries no sub-µs components). */
  def events(s: SparkSession, d: String): DataFrame = {
    GraftSession.tune(s)
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      // integral `div`, NOT `/`: true division would round-trip the
      // ~1.7e18 ns epoch value through a double (53-bit mantissa) and
      // corrupt the microsecond truncation by a few hundred ns.
      // (cast to NTZ — the engine's canonical zone-less timestamp type,
      // matching how DuckDB reads the same parquet; session is UTC.)
      case LongType => df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _        => df
    }
  }
}
