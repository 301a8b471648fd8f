package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE Spark-internal call the graft streaming source and sink
  * need: `SparkSession.internalCreateDataFrame(...)`. A DSv1
  * `Source.getBatch` must return a DataFrame whose logical plan
  * reports `isStreaming` (MicroBatchExecution asserts it), and a DSv1
  * `Sink.addBatch` receives a frame bound to the micro-batch's
  * incremental execution — running ordinary batch actions against it
  * (the commit protocol's writes) needs the physical rows re-wrapped
  * as a BATCH plan. Both directions are this `private[sql]`
  * constructor, which is why the object lives in the
  * `org.apache.spark.sql` namespace — the same access technique Delta
  * Lake and every other external table format use (their ForeachBatch/
  * sink plumbing re-wraps `queryExecution.toRdd` exactly like this).
  * Nothing else is reached through the bridge. */
object StreamingBridge {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  def batchDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
