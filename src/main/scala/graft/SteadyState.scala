package graft

import org.apache.spark.sql.DataFrame

/** Shared steady-state measurement policy for `Bench` and `ScaleProbe`
  * (one implementation so methodology fixes land in both).
  *
  * This host exhibits rare multi-second stalls (observed 100×+ outliers
  * on otherwise sub-second queries), so a single timing is not evidence.
  * The policy: run at least twice (budget permitting), add a tie-break
  * run when the first two disagree by >2× — a stall hit one of them —
  * and report the min as steady-state cost alongside (min, max, runs) so
  * a stall is visible in the artifact instead of masquerading as a
  * regression.
  */
object SteadyState {

  /** One timed noop-write execution — forces the full plan without a
    * real sink. */
  def timeOnce(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Collects up to `target` timings from `once`, tolerating re-run
    * failures: a first-run failure propagates (the query is broken), but
    * once one run has succeeded a later failure keeps the successful
    * timings rather than discarding them (ADVICE r5: a flaky re-run must
    * not erase a real measurement).
    */
  def runsOf(once: () => Double, target: Int,
             withinBudget: () => Boolean = () => true): Vector[Double] = {
    val buf = Vector.newBuilder[Double]
    buf += once() // first failure propagates
    var n = 1
    try {
      while (n < target && withinBudget()) { buf += once(); n += 1 }
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[steady] re-run failed after $n successful run(s), keeping them: " +
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
    }
    buf.result()
  }

  /** Bench policy: best-of-2 with a third tie-break run when the first
    * two disagree by >2×. Returns (min, max, number of runs). */
  def bestOf(once: () => Double,
             withinBudget: () => Boolean = () => true): (Double, Double, Int) = {
    var runs = runsOf(once, 2, withinBudget)
    if (runs.size == 2 && runs.max > 2 * runs.min && withinBudget()) {
      try runs :+= once()
      catch {
        case e: Throwable =>
          System.err.println(
            s"[steady] tie-break run failed, keeping ${runs.size} run(s): " +
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
      }
    }
    (runs.min, runs.max, runs.size)
  }
}
