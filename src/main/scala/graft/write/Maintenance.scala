package graft.write

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Table-maintenance operations every partitioned lakehouse needs at
  * scale, kept separate from the write path so they can run on their own
  * cadence (the reference delegates this to Iceberg's maintenance; here
  * it is explicit over plain partitioned parquet).
  */
object Maintenance {

  /** Compact a (year, month)-partitioned table in place: rewrite every
    * partition's accumulated small files (each incremental append adds at
    * least one file per touched partition) into one file per partition.
    * At 100 TB the small-file population is what kills scan planning —
    * file listing and footer reads scale with file COUNT, not bytes.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String): (Long, Long) = {
    def fileCount: Long = spark.read.parquet(path).inputFiles.length.toLong
    val before = fileCount
    val df = spark.read.parquet(path)
    val cols = df.columns
    // rewrite through a staging location, then swap — never overwrite the
    // only copy in place while reading it
    val tmp = path + "_compacting"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    df.repartition(col("year"), col("month"))
      .write.partitionBy("year", "month").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path)),
      s"rename $tmp -> $path failed")
    val after = fileCount
    // content must be invariant; column set too
    require(spark.read.parquet(path).columns.sorted.sameElements(cols.sorted),
      "compaction changed the schema")
    (before, after)
  }

  /** Row-count + per-partition file/row profile of a partitioned table —
    * the planning-relevant statistics a maintenance job reports. */
  def partitionProfile(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(path)
      .groupBy(col("year"), col("month"))
      .agg(count(lit(1)).as("rows"))
      .orderBy("year", "month")
  }
}
