package graft

/** [[Watchdog]] — the round-6 postmortem in executable form: a
  * deliberately-hung query must yield ONE red row and leave the harness
  * free to run the next query; exceptions pass through as messages;
  * healthy bodies return their value.
  */
class WatchdogSpec extends SparkSpec {
  import spark.implicits._

  test("a non-terminating Spark job times out, is cancelled, and the session stays usable") {
    val t0 = System.nanoTime()
    val hung = Watchdog.bounded(spark, "spec-hang", timeoutSec = 3L) {
      // one task that sleeps forever — the shape of a pathological plan
      spark.range(1).map { _ => Thread.sleep(Long.MaxValue); 0L }.collect()
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(hung.isLeft && hung.left.exists(_.startsWith("timeout")), hung)
    assert(elapsed < 60, f"watchdog must not dwell: ${elapsed}%.1fs")
    // the session must still run queries after the cancellation
    val next = Watchdog.bounded(spark, "spec-next", timeoutSec = 60L) {
      spark.range(10).count()
    }
    assert(next == Right(10L))
  }

  test("exceptions surface as Left with the exception class") {
    val r = Watchdog.bounded(spark, "spec-boom", timeoutSec = 60L) {
      sys.error("kaboom"); 0
    }
    assert(r.isLeft && r.left.exists(_.contains("kaboom")), r)
  }

  test("a healthy body returns Right with its value") {
    assert(Watchdog.bounded(spark, "spec-ok", 60L)(41 + 1) == Right(42))
  }

  test("timeoutSec falls back to the default without the env override") {
    // the spec JVM doesn't set SPARK_GRAFT_QUERY_TIMEOUT
    if (!sys.env.contains("SPARK_GRAFT_QUERY_TIMEOUT"))
      assert(Watchdog.timeoutSec(default = 120L) == 120L)
  }
}
