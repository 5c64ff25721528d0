package graft

import org.apache.spark.sql.functions._

import graft.ops.Drift

/** [[Drift]] — PSI semantics: zero on identical snapshots, large on a
  * real shift, finite under concentration (smoothing), and no mass
  * loss from out-of-range values (edge-bucket clamping).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiOf(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): (Double, Long, Long) =
    Drift.psi(a, b, "v", lo = 0.0, hi = 100.0, buckets = 10)
      .as[(Double, Long, Long)].head()

  test("identical snapshots → PSI exactly 0") {
    val df = (1 to 500).map(i => i % 100).toDF("v")
    val (psi, na, nb) = psiOf(df, df)
    assert(psi == 0.0 && na == 500 && nb == 500)
  }

  test("a bucket-crossing shift → PSI above the 0.25 'shifted' line") {
    val a = (1 to 500).map(i => (i % 50).toDouble).toDF("v") // mass in [0,50)
    val b = (1 to 500).map(i => 50.0 + (i % 50)).toDF("v")   // mass in [50,100)
    val (psi, _, _) = psiOf(a, b)
    assert(psi > 0.25, s"psi=$psi")
  }

  test("small drift scores between; monotone in the drifted fraction") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    def drifted(k: Int) = (1 to 1000).map { i =>
      if (i <= k) 95.0 else (i % 100).toDouble }.toDF("v")
    val (psiSmall, _, _) = psiOf(base, drifted(100))
    val (psiBig, _, _) = psiOf(base, drifted(400))
    assert(psiSmall > 0.0 && psiSmall < psiBig, s"$psiSmall vs $psiBig")
  }

  test("out-of-range values clamp into edge buckets — nothing dropped") {
    val a = Seq(-50.0, -1.0, 0.0, 99.0, 150.0, 1e9).toDF("v")
    val (psi, na, nb) = psiOf(a, a)
    assert(na == 6 && nb == 6, "all rows counted despite out-of-range values")
    assert(psi == 0.0)
  }

  test("all mass in one bucket stays finite (full-axis smoothing)") {
    val a = (1 to 100).map(_ => 5.0).toDF("v")
    val b = (1 to 100).map(_ => 95.0).toDF("v")
    val (psi, _, _) = psiOf(a, b)
    assert(!psi.isNaN && !psi.isInfinite && psi > 1.0)
  }
}
