package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge to `SparkSession.internalCreateDataFrame` (private[sql]) — a
  * streaming Source's getBatch must return a DataFrame whose logical plan is
  * flagged isStreaming, which has no public constructor. Same technique
  * every external streaming connector uses (a shim in the
  * org.apache.spark.sql package). */
object GraftSqlShim {

  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType,
      isStreaming: Boolean): DataFrame =
    spark.asInstanceOf[ClassicSparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming)
}
