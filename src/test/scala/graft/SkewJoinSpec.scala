package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result on skewed data") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 20000).map { i =>
      (i.toLong, if (i % 10 < 9) 7L else (i % 100).toLong)
    }.toDF("row_id", "k")
    val dim = (0L until 100L).map(k => (k, s"v$k")).toDF("dk", "payload")

    val plain = fact.join(dim, col("k") === col("dk")).drop("dk")
    val salted = SkewJoin.salted(fact, dim, "k", "dk", saltBuckets = 8)

    assert(salted.count() == plain.count())
    val a = plain.select("row_id", "k", "payload").as[(Long, Long, String)].collect().sorted.toSeq
    val b = salted.select("row_id", "k", "payload").as[(Long, Long, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("hot key fans out across salt buckets") {
    val fact = (1 to 5000).map(i => (i.toLong, 7L)).toDF("row_id", "k")
    val dim = Seq((7L, "hot")).toDF("dk", "payload")
    // count distinct salts actually used for the hot key
    val salts = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "salt must scatter the hot key over multiple sub-keys")
    assert(SkewJoin.salted(fact, dim, "k", "dk", 8).count() == 5000)
  }
}
