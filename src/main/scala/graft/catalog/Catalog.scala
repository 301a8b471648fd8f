package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S7/S9 catalog surface: namespace DDL + managed-table materialization —
  * the reference's `CREATE DATABASE IF NOT EXISTS iceberg.raw`
  * (`ingest_spark_bulk.py:220`) and dbt `table` materialization expressed
  * against Spark's catalog instead of bare paths. Works with the
  * in-memory catalog (tests) and any configured external catalog
  * unchanged. */
object Catalog {

  def createNamespace(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  def dropNamespace(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$name` CASCADE")

  /** CTAS-equivalent: full-rebuild a managed table from a DataFrame.
    * Clears any orphaned physical location first — with a non-persistent
    * (in-memory) catalog, a previous session's managed-table directory
    * survives on disk while the catalog entry does not, and saveAsTable
    * refuses to adopt it. */
  def materializeTable(df: DataFrame, namespace: String, table: String): Unit = {
    val spark = df.sparkSession
    createNamespace(spark, namespace)
    spark.sql(s"DROP TABLE IF EXISTS `$namespace`.`$table`")
    dropOrphanLocation(spark, namespace, table)
    df.write.mode(SaveMode.Overwrite).saveAsTable(s"`$namespace`.`$table`")
  }

  private def dropOrphanLocation(spark: SparkSession, namespace: String, table: String): Unit = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    // the catalog lowercases identifiers when deriving managed locations
    val loc = new org.apache.hadoop.fs.Path(
      s"$warehouse/${namespace.toLowerCase}.db/${table.toLowerCase}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Bucketed managed table: co-locates rows by hash(bucketCol) at write
    * time so equi-joins and aggregations on that column skip the shuffle
    * entirely — at 100 TB, pre-bucketing fact tables on their join key is
    * the single biggest shuffle eliminator (both sides of a bucketed
    * join read matching buckets directly). */
  def materializeBucketed(df: DataFrame, namespace: String, table: String,
                          bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    createNamespace(spark, namespace)
    spark.sql(s"DROP TABLE IF EXISTS `$namespace`.`$table`")
    dropOrphanLocation(spark, namespace, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(s"`$namespace`.`$table`")
  }

  def readTable(spark: SparkSession, namespace: String, table: String): DataFrame =
    spark.table(s"`$namespace`.`$table`")

  def tableExists(spark: SparkSession, namespace: String, table: String): Boolean =
    spark.catalog.tableExists(s"`$namespace`.`$table`")
}
