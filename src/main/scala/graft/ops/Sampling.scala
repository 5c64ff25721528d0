package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `rand()`-based sampling is nondeterministic across retries,
  * speculative tasks and engine versions — at 100 TB that means a
  * re-run ships a *different corpus*. Both operators here key the
  * sampling decision on a content hash of a stable id instead:
  * the same row set comes out on every run, on any cluster layout,
  * and on any engine that agrees on md5 (which is how the DuckDB
  * oracle checks them bit-for-bit).
  *
  *  - [[hashSample]]: Bernoulli ~fraction sample, decided per-row from
  *    the hash prefix — scan-local, no shuffle, no state.
  *  - [[stratifiedTake]]: exactly `perStratum` rows per stratum,
  *    hash-priority ordered — one window shuffle on the stratum key;
  *    parallelism scales with stratum count. The hash priority makes
  *    it a uniform without-replacement draw per stratum, not a
  *    "first N by id" bias.
  */
object Sampling {

  /** Deterministic per-row priority: lowercase hex md5 of the key's
    * string form. Hex strings compare lexicographically in hash order
    * on every engine — no numeric parsing needed. */
  def hashPriority(key: Column): Column = md5(key.cast("string"))

  /** Bernoulli sample keeping ~`fraction` of rows, decided by the
    * first 4 hex chars of the key hash (65536 buckets). Deterministic
    * in the key: re-runs and other engines select the identical rows. */
  def hashSample(df: DataFrame, key: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val n = math.round(fraction * 65536).toInt
    // n == 65536 would render a 5-char threshold ("10000") that the
    // 4-char lexicographic compare mangles — treat it as keep-all
    if (n >= 65536) df
    else df.filter(substring(hashPriority(col(key)), 1, 4) < lit(f"$n%04x"))
  }

  /** Deterministic train/val/test assignment: every row gets a split
    * label decided by its key's hash bucket against cumulative
    * fraction thresholds — scan-local (no shuffle, no RNG state), so
    * the same key lands in the same split on every re-run, every
    * engine, and every corpus superset (the property that keeps a
    * held-out set held out as the corpus grows — a `rand()` split
    * silently leaks val into train on re-ingest). Fractions must sum
    * to 1 (±ε); granularity is 1/65536 like [[hashSample]]. */
  /** Token-weighted corpus mixing: published pretraining mixes are
    * specified in TOKEN shares, not document counts (The Pile's and
    * LLaMA's composition tables; a source of long documents at a doc
    * quota would be over-represented by tokens). Targets are token
    * shares per source; the scarcest source relative to its share caps
    * the feasible total, each source gets a token budget, and its docs
    * fill the budget in md5-priority order (the house determinism
    * rule) with ≤ 1 doc of overrun — the [[graft.ops.Packing]]
    * convention: a doc is taken while the budget is not yet full.
    *
    * Determinism across engines: per-source token totals are exact
    * BIGINTs; the only floating steps (totalᴺ = min T_s/w_s and
    * budget_s = floor(totalᴺ·w_s)) are single IEEE divisions/products
    * of identical inputs, replayed literal-for-literal by the oracle;
    * the fill comparison is an exact BIGINT cumulative sum against the
    * floored budget. One shuffle: the per-source priority window.
    * Returns the selected rows plus `n_tokens`. */
  def tokenMixture(
      df: DataFrame,
      sourceCol: String,
      key: String,
      targets: Map[String, Double],
      textCol: String = "text"): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0))
    val norm = {
      val z = targets.values.sum
      targets.map { case (s, w) => s -> w / z }
    }
    val withTok = df.withColumn("n_tokens",
      size(TextSearch.tokens(col(textCol))).cast("long"))
    val totals = withTok
      .groupBy(col(sourceCol).cast("string").as(sourceCol))
      .agg(sum("n_tokens").as("t"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val present = norm.filter { case (s, _) => totals.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no target source present in the data")
    val feasible = present.map { case (s, w) => totals(s) / w }.min
    val budgets = present.toSeq.map { case (s, w) =>
      (s, math.floor(feasible * w).toLong)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = broadcast(budgets.toDF("__src", "__budget"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol).cast("string"))
      .orderBy(hashPriority(col(key)), col(key))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withTok
      .withColumn("__cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(bdf, col(sourceCol).cast("string") === col("__src"))
      .filter(col("__cum_before") < col("__budget"))
      .drop("__src", "__budget", "__cum_before")
  }

  /** Leakage-free train/val/test split: near-duplicate CLUSTERS never
    * straddle splits. The classic held-out-data bug is a near-dup of a
    * training document landing in test — a per-document hash split
    * (even a perfectly deterministic one) does exactly that whenever a
    * dup cluster exists. Here every document is keyed by its connected
    * component over the given near-dup `pairs` (`id_a`/`id_b`, from
    * any of the dedup family's pair generators — n-gram Jaccard,
    * MinHash LSH, SimHash, embedding or perceptual-hash), singletons
    * by themselves, and [[hashSplit]] assigns the COMPONENT — so a
    * whole cluster moves as one unit, with the same stability
    * guarantees (a cluster never changes splits on re-run or corpus
    * growth, unless the cluster itself grows a member that merges it
    * into another cluster — the unavoidable semantics of clustering).
    *
    * Returns `df` plus `comp` (the component representative = minimum
    * member id) and `splitCol`. Scale: the component labeling is the
    * shared [[Dedup.connectedComponents]] label propagation (bounded
    * by cluster diameter); the assignment itself is scan-local. */
  def clusterAwareSplit(
      df: DataFrame,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      idCol: String = "doc_id",
      splitCol: String = "split"): DataFrame = {
    val comps = graft.ops.Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "__cid")
    val withComp = df
      .join(comps, df(idCol) === comps("__cid"), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .drop("__cid")
    hashSplit(withComp, "comp", splits, splitCol)
  }

  def hashSplit(
      df: DataFrame,
      key: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = substring(hashPriority(col(key)), 1, 4)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val rounded = cum.init.map(c => math.round(c * 65536).toInt)
    // last split is the ELSE arm, so rounding can never drop a row.
    // A cumulative fraction that rounds to 65536 would format as the
    // 5-char "10000" and lexicographically compare FALSE against most
    // 4-char buckets, silently collapsing that split — mirror
    // mixture()'s KEEP sentinel and make such an arm always-true
    // (later arms are then unreachable: their fractions round to 0).
    val expr = splits.init.zip(rounded).foldRight(
      lit(splits.last._1): Column) { case (((name, _), n), acc) =>
      if (n >= 65536) lit(name)
      else when(bucket < lit(f"$n%04x"), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic corpus mixing: subsample sources so the output
    * matches `targets` proportions (e.g. 50% web / 30% code / 20%
    * papers) at the LARGEST feasible size — the scarcest source
    * relative to its target caps the total, everything else
    * downsamples to fit. Selection is [[hashSample]]-style per source
    * (hash-prefix threshold), so the mix is reproducible and nested
    * across re-runs.
    *
    * Cost: one small `groupBy(source).count()` (rows = #sources) to
    * derive fractions on the driver, then a single scan-local filtered
    * pass joined against a broadcast threshold table — no shuffle of
    * the corpus itself. Sources absent from `targets` are dropped.
    * Proportions are exact in expectation; per-source counts deviate
    * by hash-bucket granularity (~1/65536). */
  def mixture(
      df: DataFrame,
      sourceCol: String,
      key: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0))
    val norm = {
      val z = targets.values.sum
      targets.map { case (s, w) => s -> w / z }
    }
    // source values compare as strings throughout (targets keys are
    // strings), so a non-string source column must not crash the
    // driver-side collect or skew the join
    val counts = df.groupBy(col(sourceCol).cast("string").as(sourceCol)).count()
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val present = norm.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no target source present in the data")
    // the scarcest source relative to its target caps the total size
    val total = present.map { case (s, t) => counts(s) / t }.min
    val thresholds = present.toSeq.map { case (s, t) =>
      val frac = math.min(1.0, total * t / counts(s))
      val n = math.min(65536L, math.round(frac * 65536)).toInt
      // "KEEP" sentinel for full sources — a 5-char hex bound would
      // compare lexicographically against 4-char prefixes and break
      (s, if (n >= 65536) "KEEP" else f"$n%04x")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val tdf = broadcast(thresholds.toDF("__src", "__thresh"))
    df.join(tdf, col(sourceCol).cast("string") === col("__src"))
      .filter(col("__thresh") === "KEEP" ||
        substring(hashPriority(col(key)), 1, 4) < col("__thresh"))
      .drop("__src", "__thresh")
  }

  /** Temperature-flattened corpus mixing (the T5/PaLM recipe): output
    * source proportions follow `count^alpha` — `alpha = 1` keeps the
    * natural mix, `alpha → 0` approaches uniform-over-sources, the
    * usual 0.3–0.7 band up-weights scarce sources without drowning the
    * head. Reduces to [[mixture]] with `targets = counts^alpha`
    * (computed from the same one tiny `groupBy(source).count()`), so it
    * inherits the scan-local hash-threshold selection: reproducible,
    * nested, no corpus shuffle. */
  def temperatureMixture(
      df: DataFrame,
      sourceCol: String,
      key: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    val counts = df.groupBy(col(sourceCol).cast("string").as(sourceCol)).count()
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty corpus")
    mixture(df, sourceCol, key,
      counts.map { case (s, c) => s -> math.pow(c.toDouble, alpha) })
  }

  /** Exactly `min(perStratum, |stratum|)` rows per stratum, drawn in
    * hash-priority order with the key as tie-break. */
  def stratifiedTake(
      df: DataFrame,
      strata: String,
      key: String,
      perStratum: Int): DataFrame = {
    require(perStratum > 0)
    val w = Window.partitionBy(col(strata))
      .orderBy(hashPriority(col(key)), col(key))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Per-group row cap as a native bounded aggregate — the per-domain
    * document cap of web-corpus curation (CommonCrawl-style per-host
    * limits), keeping exactly `min(n, |group|)` rows per group in a
    * deterministic uniform draw. Returns `(groupCol, rn, idCol)` with
    * `rn` 1-based in draw order.
    *
    * Same selection semantics as [[stratifiedTake]], different physical
    * shape: instead of a window (full per-group sort; every row rides
    * the shuffle), the draw runs through the bounded-buffer `top_k`
    * TypedImperativeAggregate, so map-side partials carry at most `n`
    * (id, priority) pairs per group — at 100 TB the difference between
    * shuffling the corpus and shuffling the winners. The priority is
    * the first 13 md5 hex chars of the id as an exact 52-bit integer in
    * a double (no precision loss, so `top_k`'s (score DESC, id ASC)
    * order replays exactly as SQL `ROW_NUMBER() OVER (ORDER BY pri
    * DESC, id)` — the `doc_source_cap` oracle).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0)
    val pri = conv(substring(hashPriority(col(idCol)), 1, 13), 16, 10).cast("double")
    df.groupBy(col(groupCol))
      .agg(graft.expr.TopKExpr.topK(col(idCol).cast("long"), pri, n).as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as(idCol))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006
    * "Weighted random sampling with a reservoir", the A-ES key): each
    * row draws a deterministic uniform u ∈ (0,1) from its key hash
    * (the exact 52-bit md5 prefix, `(h + 0.5)/2⁵²` — every step exact
    * in double), gets key `ln(u)/w` (a monotone transform of the
    * classic u^(1/w)), and the n LARGEST keys win — exactly the
    * distribution of n sequential weighted draws without replacement.
    * Deterministic in the key (the house rule: re-runs and other
    * engines draw the identical sample); rows with weight ≤ 0 can
    * never win and are filtered.
    *
    * Physical shape: the bounded-buffer `top_k` aggregate, so map-side
    * partials carry at most n (id, key) pairs — no full sort, no
    * per-group window shuffle; at 100 TB the winners ride the
    * exchange, not the corpus. Cross-engine determinism: the only
    * inexact steps are one `ln` and one division of bit-identical
    * inputs; an order flip would need two keys within ~1 ulp, which
    * the id tie-break of `top_k` (score DESC, id ASC) cannot even see
    * — distinct keys this close do not occur in practice, and the
    * oracle run at two scale factors pins it. */
  def weightedTake(df: DataFrame, key: String, weightCol: String, n: Int): DataFrame = {
    require(n > 0)
    df.filter(col(weightCol) > 0)
      .groupBy()
      .agg(graft.expr.TopKExpr.topK(col(key).cast("long"), esKey(key, weightCol), n)
        .as("__topk"))
      .select(posexplode(col("__topk")))
      .select((col("pos") + 1).cast("long").as("rn"), col("col.id").as(key))
  }

  /** [[weightedTake]] per group — `min(n, feasible)` weighted draws
    * without replacement within each stratum (the per-source variant:
    * sample a token-weighted quota from every domain independently).
    * Same A-ES keys, same bounded `top_k` physical shape as
    * [[capPerGroup]]: map-side partials carry ≤ n pairs per group. */
  def weightedTakePerGroup(
      df: DataFrame, groupCol: String, key: String, weightCol: String, n: Int): DataFrame = {
    require(n > 0)
    df.filter(col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(graft.expr.TopKExpr.topK(col(key).cast("long"), esKey(key, weightCol), n)
        .as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as(key))
  }

  /** The Efraimidis–Spirakis draw key `ln(u)/w` (see [[weightedTake]]). */
  private def esKey(key: String, weightCol: String): Column = {
    val h = conv(substring(hashPriority(col(key)), 1, 13), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4503599627370496.0) // 2^52; u ∈ (0,1) exactly
    log(u) / col(weightCol).cast("double")
  }
}
