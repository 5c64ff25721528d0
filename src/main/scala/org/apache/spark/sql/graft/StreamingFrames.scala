package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one-method bridge a V1 streaming [[org.apache.spark.sql
  * .execution.streaming.Source]] needs: `MicroBatchExecution` asserts
  * that every `getBatch` result has `isStreaming = true`, and the only
  * constructor for such a frame is `SparkSession.internalCreateDataFrame`
  * — `private[sql]`, so this shim lives in the `org.apache.spark.sql`
  * namespace (the standard third-party V1 connector pattern; the
  * method is stable public bytecode across Spark 3.x/4.x). Nothing
  * else of the internal surface is touched. */
object StreamingFrames {

  /** `rdd` as a STREAMING-tagged DataFrame of `schema`. */
  def streaming(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType)
      : DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse re-tag, for the TEST harness only: a `Source.getBatch`
    * result refuses batch execution (`UnsupportedOperationChecker`), so
    * a spec that drives `getBatch` directly — outside
    * `MicroBatchExecution` — unwraps the streaming `LogicalRDD` back
    * into a batch frame to count/collect it. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        spark.internalCreateDataFrame(
          l.rdd, df.schema, isStreaming = false)
      case other => throw new IllegalArgumentException(
        s"not a streaming-frame plan: ${other.getClass.getName}")
    }
  }
}
