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

  /** CTAS-equivalent: full-rebuild a managed table from a DataFrame. */
  def materializeTable(df: DataFrame, namespace: String, table: String): Unit = {
    createNamespace(df.sparkSession, namespace)
    df.write.mode(SaveMode.Overwrite).saveAsTable(s"`$namespace`.`$table`")
  }

  /** Bucketed managed table: co-locates rows by hash(bucketCol) at write
    * time so equi-joins and aggregations on that column skip the shuffle
    * entirely — at 100 TB, pre-bucketing fact tables on their join key is
    * the single biggest shuffle eliminator (both sides of a bucketed
    * join read matching buckets directly). */
  def materializeBucketed(df: DataFrame, namespace: String, table: String,
                          bucketCol: String, numBuckets: Int): Unit = {
    createNamespace(df.sparkSession, namespace)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(s"`$namespace`.`$table`")
  }

  def readTable(spark: SparkSession, namespace: String, table: String): DataFrame =
    spark.table(s"`$namespace`.`$table`")

  def tableExists(spark: SparkSession, namespace: String, table: String): Boolean =
    spark.catalog.tableExists(s"`$namespace`.`$table`")
}
