package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over the corpus — the
  * vocabulary-building step of an LLM data pipeline (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units").
  *
  * Trains on the DISTINCT-WORD HISTOGRAM, not the corpus: one
  * `explode → groupBy(word) → sum` pass reduces 100 TB of text to a
  * vocabulary-sized frame (the original BPE formulation — pair counts
  * weighted by word frequency are identical to counting over the raw
  * text), and every merge iteration is then one map-side-combined agg
  * over that histogram plus a driver-side argmax of ONE row. The same
  * distributed-loop shape as the PQ Lloyd trainer: per-iteration driver
  * state is a single (pair, count) row, never the data.
  *
  * Ties on pair frequency break lexicographically, so the learned merge
  * list is deterministic for a given corpus under any partitioning.
  */
object Bpe {

  /** End-of-word sentinel: lets merges learn word-final units (the
    * "est</w>" of the original paper) and makes decoding unambiguous.
    * A printable char outside the tokenizer's [a-z0-9] alphabet. */
  val EndOfWord = "_"

  /** Learn `numMerges` merges from the corpus. Returns the ordered
    * merge list; apply with [[encodeWord]]/[[tokenCount]]. Pairs seen
    * fewer than `minFreq` times stop the training early (merging noise
    * memorizes the corpus tail). */
  def train(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 64,
      minFreq: Long = 2L,
      checkpointDir: Option[String] = None): Seq[(String, String)] = {
    import org.apache.spark.storage.StorageLevel
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0)
    // the word histogram: symbols start as characters + sentinel
    val initial = df
      .select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(concat(split(col("w"), ""), array(lit(EndOfWord))).as("syms"),
        col("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = Vector.newBuilder[(String, String)]
    var words = initial
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      // pair frequencies, weighted by word count; deterministic argmax
      val top = words
        .select(col("cnt"), explode(
          zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("cnt")).as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(2) < minFreq) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val merged = mergePair(col("syms"), a, b)
        // checkpoint, not persist: each round nests another
        // aggregate-HOF into the plan and Catalyst's expression
        // duplication makes the ANALYZED tree grow multiplicatively —
        // by ~16 rounds the driver OOMs on plan size alone. Truncating
        // the lineage keeps every round's plan one merge deep.
        // checkpointDir selects executor-local vs durable blocks
        // ([[Checkpointing.truncate]]); merges are identical either way.
        val next = Checkpointing.truncate(
          words.select(merged.as("syms"), col("cnt")), checkpointDir)
        words.unpersist(blocking = false)
        words = next
        it += 1
      }
    }
    words.unpersist(blocking = false)
    merges.result()
  }

  /** One merge round as a pure Column program (no UDF): left-to-right
    * replacement of adjacent (a, b) with a+b via `aggregate` — matches
    * the reference greedy semantics including the overlap rule
    * ("aaa" with merge (a,a) → "aa","a"). The `skip` flag marks "the
    * previous symbol was just consumed by a merge", preventing the
    * merged token from immediately re-merging. */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"), lit(false).as("skip"))
    val step = (acc: Column, s: Column) => {
      val out = acc.getField("out")
      val skip = acc.getField("skip")
      // guard element_at behind `when`: ANSI mode throws on empty arrays
      val last = when(size(out) > 0, element_at(out, -1))
      val canMerge = coalesce(
        !skip && last === lit(a) && s === lit(b), lit(false))
      struct(
        when(canMerge,
          concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
          .otherwise(concat(out, array(s))).as("out"),
        canMerge.as("skip"))
    }
    aggregate(syms, zero, step, acc => acc.getField("out"))
  }

  /** Apply a learned merge list to one word (driver/test helper and the
    * closure body of [[tokenCount]]): greedy left-to-right per merge, in
    * learned order. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = (word.toLowerCase.split("").filter(_.nonEmpty) :+ EndOfWord).toSeq
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** BPE token count per row under a learned merge list (the merges are
    * a constant riding the task closure). */
  def tokenCount(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val ms = merges.toArray
    val cnt = udf { (s: String) =>
      if (s == null) 0L
      else s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(w => encodeWord(w, ms.toSeq).length.toLong).sum
    }
    df.withColumn("bpe_tokens", cnt(col(textCol)))
  }
}
