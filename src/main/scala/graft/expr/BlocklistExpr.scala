package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring automaton (Aho & Corasick,
  * CACM 1975) — blocklist filtering for corpus curation (the C4/RefinedWeb
  * "bad words / boilerplate phrase" gate) at engine speed: ONE pass
  * over each document regardless of pattern count, O(len + matches),
  * where the naive form is k `contains()` scans (k = blocklist size,
  * often 10³–10⁴ phrases — a 10,000× inner-loop difference at 100 TB).
  *
  * The automaton compiles once per (task, expression instance)
  * (`@transient lazy`, the Bloom-probe caching pattern) from a
  * FOLDABLE pattern-array operand — non-constant patterns are
  * rejected at analysis time. Matching is exact case-sensitive
  * substring semantics, so a `contains`-per-pattern formulation is a
  * cross-engine oracle twin by definition.
  */
final class AcAutomaton(patterns: Array[String]) {
  // Construction uses the readable growable trie (per-node child map +
  // BFS fail links with fail-merged output lists), then FLATTENS to a
  // CSR sorted-edge-array layout — the inner loop at 100 TB does one
  // binary search over a node's sorted edge slice per character
  // (primitive arrays, no per-char hashing or boxing; VERDICT r9
  // stretch #8 — measured 1.6× over the HashMap-per-node walk at a
  // 10⁴-phrase blocklist, SCALE.md; `BlocklistSpec` property-pins the
  // layout against contains-per-pattern ground truth).
  //
  // edgeStart(n)..edgeStart(n+1): node n's edges, chars ascending, in
  // (edgeChars, edgeTargets); failArr: fail links; outStart/outPats:
  // CSR of each node's matched-pattern indices (fail-closure merged).
  private val (edgeStart, edgeChars, edgeTargets, failArr, outStart, outPats) = {
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val fail = scala.collection.mutable.ArrayBuffer(0)
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      for (c <- p) {
        node = children(node).getOrElseUpdate(c, {
          children += scala.collection.mutable.HashMap.empty[Char, Int]
          fail += 0
          out += Nil
          children.length - 1
        })
      }
      out(node) = idx :: out(node)
    }
    // BFS fail links; merge output links along failures
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- children(u)) {
        queue.enqueue(v)
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = children(f).get(c).filter(_ != v).getOrElse(0)
        out(v) = out(v) ::: out(fail(v))
      }
    }
    // flatten
    val n = children.length
    val es = new Array[Int](n + 1)
    var i = 0
    while (i < n) { es(i + 1) = es(i) + children(i).size; i += 1 }
    val ec = new Array[Char](es(n)); val et = new Array[Int](es(n))
    i = 0
    while (i < n) {
      var k = es(i)
      children(i).toArray.sortBy(_._1).foreach { case (c, t) =>
        ec(k) = c; et(k) = t; k += 1 }
      i += 1
    }
    val os = new Array[Int](n + 1)
    i = 0
    while (i < n) { os(i + 1) = os(i) + out(i).size; i += 1 }
    val op = new Array[Int](os(n))
    i = 0
    while (i < n) {
      var k = os(i)
      out(i).foreach { p => op(k) = p; k += 1 }
      i += 1
    }
    (es, ec, et, fail.toArray, os, op)
  }

  /** Target of node's `c`-edge, or -1 — binary search over the node's
    * sorted edge slice. */
  private def step(node: Int, c: Char): Int = {
    var lo = edgeStart(node); var hi = edgeStart(node + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = edgeChars(mid)
      if (mc == c) return edgeTargets(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Indices of the DISTINCT patterns occurring in `text`, ascending. */
  def matches(text: String): Array[Int] = {
    val hit = new Array[Boolean](patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var nxt = step(node, c)
      while (node != 0 && nxt < 0) { node = failArr(node); nxt = step(node, c) }
      node = if (nxt >= 0) nxt else 0
      var o = outStart(node); val oEnd = outStart(node + 1)
      while (o < oEnd) { hit(outPats(o)) = true; o += 1 }
      i += 1
    }
    (0 until patterns.length).filter(hit).toArray
  }

  def anyMatch(text: String): Boolean = {
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var nxt = step(node, c)
      while (node != 0 && nxt < 0) { node = failArr(node); nxt = step(node, c) }
      node = if (nxt >= 0) nxt else 0
      if (outStart(node + 1) > outStart(node)) return true
      i += 1
    }
    false
  }
}

/** Shared base: (text, foldable pattern array) with a per-task cached
  * automaton. */
abstract class BlocklistBase extends Expression with CodegenFallback {
  def text: Expression
  def patternsExpr: Expression
  override def children: Seq[Expression] = Seq(text, patternsExpr)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text argument must be STRING, got ${text.dataType.simpleString}")
    else if (!patternsExpr.dataType.isInstanceOf[ArrayType] ||
        patternsExpr.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: patterns must be ARRAY<STRING>, got ${patternsExpr.dataType.simpleString}")
    else if (!patternsExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: patterns must be a constant (foldable) array, got ${patternsExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient protected final lazy val pats: Array[String] =
    patternsExpr.eval() match {
      case null => throw new IllegalArgumentException(
        s"$prettyName: patterns must be a non-null array literal")
      case a: ArrayData =>
        val out = a.toObjectArray(StringType).map {
          case s: UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"$prettyName: bad pattern element $other")
        }
        require(out.nonEmpty && out.forall(_.nonEmpty),
          s"$prettyName: patterns must be non-empty strings")
        out
      case other => throw new IllegalArgumentException(
        s"$prettyName: bad patterns operand ${other.getClass}")
    }

  @transient protected final lazy val automaton: AcAutomaton = new AcAutomaton(pats)
}

/** `blocklist_any(text, patterns)` — true when ANY pattern occurs as a
  * substring; the curation gate (`filter(!blocklist_any(...))`). */
case class BlocklistAny(text: Expression, patternsExpr: Expression)
  extends BlocklistBase {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), patternsExpr = newChildren(1))
  override def dataType: DataType = BooleanType
  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null else automaton.anyMatch(t.asInstanceOf[UTF8String].toString)
  }
  override def prettyName: String = "blocklist_any"
}

/** `blocklist_matches(text, patterns)` — the DISTINCT matched patterns
  * in input-array order (the audit view: WHICH rules fired). */
case class BlocklistMatches(text: Expression, patternsExpr: Expression)
  extends BlocklistBase {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), patternsExpr = newChildren(1))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) null
    else new GenericArrayData(
      automaton.matches(t.asInstanceOf[UTF8String].toString)
        .map(i => UTF8String.fromString(pats(i))))
  }
  override def prettyName: String = "blocklist_matches"
}

object BlocklistExpr {

  def blocklistAny(text: Column, patterns: Seq[String]): Column =
    Bridge.toColumn(BlocklistAny(Bridge.toExpr(text), patternsLit(patterns)))

  def blocklistMatches(text: Column, patterns: Seq[String]): Column =
    Bridge.toColumn(BlocklistMatches(Bridge.toExpr(text), patternsLit(patterns)))

  private def patternsLit(patterns: Seq[String]): Expression =
    org.apache.spark.sql.catalyst.expressions.CreateArray(
      patterns.map(p => Literal(p)))

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "blocklist_any" -> (es => {
      require(es.length == 2, s"blocklist_any expects 2 arguments, got ${es.length}")
      BlocklistAny(es(0), es(1))
    }),
    "blocklist_matches" -> (es => {
      require(es.length == 2, s"blocklist_matches expects 2 arguments, got ${es.length}")
      BlocklistMatches(es(0), es(1))
    }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftFunctions.registerTemp(spark, functions)
}
