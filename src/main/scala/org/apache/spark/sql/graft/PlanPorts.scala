package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** The one-method bridge a width-isolated session needs: re-bind a
  * DataFrame's analyzed plan into ANOTHER session of the same
  * SparkContext. The only constructor for that is `Dataset.ofRows` —
  * `private[sql]`, hence this shim in the `org.apache.spark.sql`
  * namespace (the same isolated pattern as [[StreamingFrames]];
  * nothing else of the internal surface is touched).
  *
  * Used by [[graft.ops.Graph.pageRank]]: its iteration shuffles run in
  * a [[graft.ops.SizedSession]] so the CALLER's
  * `spark.sql.shuffle.partitions` is never mutated (round-15 ADVICE),
  * but the caller's `edges` frame must follow the work into that
  * session. Cached plans carry: the cache manager lives in shared
  * state, so a persisted input re-bound here still hits its cache. */
object PlanPorts {

  def inSession(target: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      target.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)
}
