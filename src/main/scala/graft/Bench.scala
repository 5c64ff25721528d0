package graft

import org.apache.spark.sql.SparkSession

import graft.queries.IvmScaffold

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Failures are recorded in an explicit `"errors"` map (query →
  * exception class+message) and excluded from per-query timings, so a
  * broken query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the engine's standard surface: SQL functions + the lambda-invariant
    // hoist rule, so the gate exercises what library sessions run
    Graft.registerAll(spark)

    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    try Warmup.run(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[warmup] failed: ${e.getMessage}") }

    // fixed synthetic calibration kernel (VERDICT r8 ask #1): emitted as
    // "calib_sec" so totals are comparable across rounds/hosts — divide
    // any timing by calib_sec to get host-independent kernel units. A
    // kernel failure records -1 rather than killing the bench.
    val calibSec =
      try Calibrate.calibSec(spark)
      catch {
        case e: Throwable =>
          System.err.println(s"[calib] failed: ${e.getMessage}"); -1.0
      }
    System.err.println(f"[calib] kernel sec=$calibSec%.3f")

    // pre-build the IVM scaffolds with explicit per-family timings
    // (VERDICT r8 ask #8): scaffold cost becomes a visible line item
    // instead of inflating each IVM family's first query's max run.
    try IvmScaffold.prebuild(spark, sfDir).foreach { case (fam, sec) =>
      System.err.println(f"[scaffold] $fam sec=$sec%.3f")
    } catch {
      case e: Throwable => System.err.println(s"[scaffold] prebuild failed: ${e.getMessage}")
    }

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val ranges  = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Int)]
    val errors  = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val benchStart = System.nanoTime()
    // re-executions stop once the run has spent this much wall — keeps the
    // whole bench bounded even if the harness enforces a timeout. Two full
    // passes over all queries cost ~80 s at sf0.1, so 1200 s leaves room
    // for a third pass on stall-hit queries.
    val rerunBudgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1200").toDouble
    def withinBudget: Boolean = (System.nanoTime() - benchStart) / 1e9 < rerunBudgetSec
    // Per-query watchdog over the whole best-of-N loop (round-6 lesson:
    // one non-terminating query held Bench past the driver's 1-hour
    // kill and the artifact was rc=124/unparsed). 300 s bounds a
    // pathological query while leaving ~30× headroom over the slowest
    // healthy query's full best-of-N at sf0.1.
    val perQuerySec = Watchdog.timeoutSec(default = 300L)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // best-of-N policy lives in SteadyState.bestOf (shared with
      // ScaleProbe, unit-tested in SteadyStateSpec): min over runs is
      // steady-state cost, a >2× disagreement triggers a tie-break run,
      // and per-query (min,max,runs) makes any stall visible in the
      // artifact itself rather than masquerading as a regression.
      Watchdog.bounded(spark, s"bench-$name", perQuerySec) {
        SteadyState.bestOf(() => SteadyState.timeOnce(fn(spark, sfDir)), () => withinBudget)
      } match {
        case Right((mn, mx, n)) =>
          timings(name) = mn
          ranges(name) = (mn, mx, n)
        case Left(err) =>
          errors(name) = err
      }
    }

    val qs = timings.map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val rs = ranges.map { case (k, (mn, mx, n)) =>
      s""""${esc(k)}":{"min":$mn,"max":$mx,"runs":$n}""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","calib_sec":$calibSec,"queries":$qs,"ranges":$rs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":"${esc(sfDir)}"}"""
    // Short trailer line (VERDICT r5 ask #2): the driver records a bounded
    // tail of stdout, and the full line above can outgrow it — round 5's
    // artifact lost the headline total to truncation. The trailer is always
    // short enough to survive any tail window.
    val trailerLine =
      s"""{"metric":"total","value":$total,"unit":"sec","calib_sec":$calibSec,"n_ok":${timings.size},"n_err":${errors.size},"sf":"${esc(sfDir)}"}"""
    println(fullLine)
    println(trailerLine)
    // Self-archive (VERDICT r9 ask #7): a truncated stdout capture
    // ("parsed": null in BENCH_r09.json) must never again lose the
    // per-query map — the two lines also land in a well-known file,
    // referenced from COVERAGE.md, parseable from disk at any time.
    try {
      val archive = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "/tmp/bench_last.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(archive),
        (fullLine + "\n" + trailerLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] archived to $archive")
    } catch {
      case e: Throwable => System.err.println(s"[bench] archive failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
