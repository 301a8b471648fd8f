package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE Spark-internal call the graft streaming source needs:
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)`.
  * A DSv1 `Source.getBatch` must return a DataFrame whose logical plan
  * reports `isStreaming` (MicroBatchExecution asserts it), and the only
  * way to mark an existing RDD-backed plan streaming is this
  * `private[sql]` constructor — so this object lives in the
  * `org.apache.spark.sql` namespace, the same access technique Delta
  * Lake and every other external table format use for their streaming
  * sources. Nothing else is reached through the bridge. */
object StreamingBridge {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
