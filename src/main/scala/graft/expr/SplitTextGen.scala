package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.ChunkText

/** O-CHUNK as a Catalyst `Generator` — the SQL surface of the recursive
  * splitter:
  *
  * {{{
  *   SELECT doc_id, c.chunk_idx, c.chunk
  *   FROM documents
  *   LATERAL VIEW split_text(text, 700, 200) c AS chunk_idx, chunk
  * }}}
  *
  * The Dataset path uses `ChunkText.explodeChunks` (flatMap/posexplode);
  * this Generator covers SQL-only callers. 1→N row expansion happens
  * inside GenerateExec — no array materialization of all chunks per row
  * in the output schema.
  */
case class SplitTextGen(text: Expression, size: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size, overlap)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      val sz = size.eval(input).asInstanceOf[Int]
      val ov = overlap.eval(input).asInstanceOf[Int]
      ChunkText.splitText(t.toString, sz, ov).iterator.zipWithIndex.map {
        case (c, i) => InternalRow(i, UTF8String.fromString(c))
      }
    }
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(text = cs(0), size = cs(1), overlap = cs(2))
}

object SplitTextGen {
  /** SQL surface: `split_text(text, size, overlap)` (a Generator — used
    * via LATERAL VIEW). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "split_text" -> (es => SplitTextGen(es(0), es(1), es(2))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
