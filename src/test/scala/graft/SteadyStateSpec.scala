package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's best-of-N selection is load-bearing evidence (VERDICT r5
  * ask #6): these cases pin the tie-break policy itself with injected
  * fake timings — no Spark involved.
  */
class SteadyStateSpec extends AnyFunSuite {

  private def fake(ts: Double*): () => Double = {
    val it = ts.iterator
    () => it.next()
  }

  test("steady pair: two runs, no tie-break, min reported") {
    val (mn, mx, n) = SteadyState.bestOf(fake(0.35, 0.30))
    assert(n == 2); assert(mn == 0.30); assert(mx == 0.35)
  }

  test("stalled first run triggers the third run and the stall stays visible in max") {
    // 1.0 vs 0.3 disagree by >2x -> a stall hit one of them -> tie-break
    val (mn, mx, n) = SteadyState.bestOf(fake(1.0, 0.3, 0.31))
    assert(n == 3); assert(mn == 0.3); assert(mx == 1.0)
  }

  test("exactly-2x disagreement does NOT trigger a third run (boundary)") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val (_, _, n) = SteadyState.bestOf { () =>
      if (calls.incrementAndGet() == 1) 0.6 else 0.3
    }
    assert(n == 2, "max == 2*min is within tolerance; only > 2x re-runs")
  }

  test("exhausted budget stops after the first run") {
    val (mn, mx, n) = SteadyState.bestOf(fake(0.5), () => false)
    assert(n == 1); assert(mn == 0.5); assert(mx == 0.5)
  }

  test("budget exhausted between runs skips only the tie-break") {
    var checks = 0
    val budget = () => { checks += 1; checks <= 1 } // true for run 2, false for tie-break
    val (mn, _, n) = SteadyState.bestOf(fake(1.0, 0.3), budget)
    assert(n == 2); assert(mn == 0.3)
  }

  test("re-run failure keeps the successful first timing instead of discarding it") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val (mn, mx, n) = SteadyState.bestOf { () =>
      if (calls.incrementAndGet() == 1) 0.42 else sys.error("flaky re-run")
    }
    assert(n == 1); assert(mn == 0.42); assert(mx == 0.42)
  }

  test("tie-break failure keeps the two successful timings") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val (mn, mx, n) = SteadyState.bestOf { () =>
      calls.incrementAndGet() match {
        case 1 => 1.0
        case 2 => 0.3
        case _ => sys.error("flaky tie-break")
      }
    }
    assert(n == 2); assert(mn == 0.3); assert(mx == 1.0)
  }

  test("first-run failure propagates — a broken query cannot report a timing") {
    intercept[RuntimeException] {
      SteadyState.bestOf(() => sys.error("broken query"))
    }
  }

  test("runsOf collects the requested number of runs and reports reality") {
    assert(SteadyState.runsOf(fake(3.0, 2.0, 1.0), 3) == Vector(3.0, 2.0, 1.0))
    assert(SteadyState.runsOf(fake(3.0), 3, () => false) == Vector(3.0))
  }
}
