package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join via key salting.
  *
  * At 100 TB a handful of hot keys (one viral document id, one null-ish
  * default) can pin an entire shuffle partition to a single task. AQE's
  * skew-join split handles sort-merge cases adaptively; salting is the
  * explicit, planner-independent form: the skewed (fact) side scatters
  * each key across `saltBuckets` sub-keys, the compact (dim) side
  * replicates each row `saltBuckets` times, and the join key becomes
  * `(key, salt)` — hot keys fan out over `saltBuckets` tasks.
  *
  * The salt on the fact side is `pmod(hash(monotonically_increasing_id),
  * buckets)` — deterministic per run, uniformly scattering, and not
  * dependent on any data column (a data-derived salt would re-skew if
  * the salting column correlates with the hot key).
  */
object SkewJoin {

  /** Inner equi-join `fact.key == dim.key` with the fact side salted and
    * the dim side replicated. Output columns = fact.* ++ dim.* (minus
    * the dim join key). */
  def salted(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact
      .join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"))
      .drop(replicatedDim(dimKey))
      .drop("__salt")
  }
}
