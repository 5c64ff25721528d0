package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL registration of the curation surface: the Column-API operators
  * of [[TextSanitize]], [[TextAnalysis]], [[Sampling]] and
  * `graft.pipeline.Layout.zValue`, exposed as plain SQL functions so
  * `spark.sql` users get the identical expression trees (same codegen,
  * same semantics — registration goes through the Column⇄Expression
  * bridge, no UDF wrapping).
  *
  * Registered names (all single-text-argument unless noted):
  * `mask_pii`, `strip_boilerplate`, `sanitize_text`, `quality_score`,
  * `lang_id` (returns `struct(lang, score)`), `token_count`,
  * `subword_count`, `fingerprint`, `rolling_hash`, `hash_priority`,
  * `z_value(c1, c2[, c3])` (Morton interleave at 16 bits/column),
  * `hilbert_value(x, y)` (Hilbert curve position at 16 bits/axis).
  */
object CurationFunctions {

  /** The builders convert Column-API compositions to catalyst trees at
    * analysis time, when `SparkSession.active` is the analyzing session
    * — no session captured at definition time, which is what lets the
    * same list back both [[register]] and config-time injection via
    * [[graft.GraftExtensions]]. */
  val functions: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    def one(name: String)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) =
      name -> (es => {
        require(es.size == 1, s"$name takes exactly one argument, got ${es.size}")
        Bridge.toExpr(SparkSession.active, f(Bridge.toColumn(es.head)))
      })
    Seq(
      one("mask_pii")(TextSanitize.maskPii),
      one("strip_boilerplate")(TextSanitize.stripBoilerplate),
      one("sanitize_text")(TextSanitize.sanitize),
      one("quality_score")(TextAnalysis.qualityScore(_)),
      one("lang_id")(TextAnalysis.langId),
      one("token_count")(TextAnalysis.tokenCount),
      one("subword_count")(TextAnalysis.subwordCount),
      one("fingerprint")(TextAnalysis.fingerprint),
      one("rolling_hash")(TextAnalysis.rollingHash),
      one("hash_priority")(Sampling.hashPriority),
      "z_value" -> (es => {
        require(es.size >= 2 && es.size <= 3,
          "z_value takes 2 or 3 columns at 16 bits each")
        Bridge.toExpr(SparkSession.active, graft.pipeline.Layout.zValue(es.map(Bridge.toColumn)))
      }),
      "hilbert_value" -> (es => {
        require(es.size == 2, "hilbert_value takes 2 columns (16 bits each)")
        Bridge.toExpr(SparkSession.active, graft.pipeline.Layout.hilbertValue(
          Bridge.toColumn(es(0)), Bridge.toColumn(es(1))))
      }))
  }

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
