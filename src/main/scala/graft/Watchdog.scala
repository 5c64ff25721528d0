package graft

import org.apache.spark.sql.SparkSession

/** Bounded-wall-clock execution for harness queries.
  *
  * Round 6 lost its ENTIRE correctness and bench artifact to one
  * non-terminating query: `Verify` and `Bench` ran queries sequentially
  * with no per-query timeout, so a single pathological plan zeroed the
  * evidence for 87 healthy queries. This wrapper makes that structurally
  * impossible: each query body runs on its own daemon thread under a
  * Spark job group; on timeout the job group is cancelled (tasks
  * interrupted), the thread is abandoned, and the harness records
  * `timeout` and MOVES ON.
  *
  * Limits of the guarantee: `cancelJobGroup` kills Spark jobs, but a
  * driver-side infinite loop (e.g. pathological planning) cannot be
  * killed — the daemon thread is abandoned and cannot block JVM exit.
  * Either way the harness finishes and every other query's row survives.
  */
object Watchdog {

  /** Per-query timeout in seconds. Env-overridable so the driver's
    * sf0.1 bench can run with more headroom than sf0.01 verify. */
  def timeoutSec(default: Long): Long =
    sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT").map(_.toLong).getOrElse(default)

  /** Run `body` under `timeoutSec` seconds of wall clock. Returns
    * `Right(result)` on success, `Left(message)` on exception or
    * timeout (message starts with "timeout" in the latter case). */
  def bounded[T](spark: SparkSession, group: String, timeoutSec: Long)(
      body: => T): Either[String, T] = {
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var out: Either[String, T] =
      Left(f"timeout after ${timeoutSec}s")
    val t = new Thread(() => {
      // job group is thread-local: every job body launches on this
      // thread carries it, so cancelJobGroup reaches all of them
      spark.sparkContext.setJobGroup(group, s"watchdog:$group",
        interruptOnCancel = true)
      try { val r = body; out = Right(r) }
      catch { case e: Throwable =>
        out = Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      finally {
        spark.sparkContext.clearJobGroup()
        done.countDown()
      }
    }, s"watchdog-$group")
    t.setDaemon(true)
    t.start()
    val finished = done.await(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      spark.sparkContext.cancelJobGroup(group)
      // a cancelled body usually surfaces as SparkException within
      // moments; give it a beat so `out` reflects what actually
      // happened, then abandon the thread either way
      val landed = done.await(5, java.util.concurrent.TimeUnit.SECONDS)
      t.interrupt()
      out match {
        // the body finished JUST past the deadline, before the
        // cancellation landed — a valid result must not be discarded
        case Right(r) if landed => Right(r)
        case _ => Left(f"timeout after ${timeoutSec}s (job group cancelled)")
      }
    } else out
  }
}
