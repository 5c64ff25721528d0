package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dumps for the optimization-round evidence
  * trail (`plans/r<N>/<query>_{before,after}.txt`): one file per named
  * query, the exact `.explain("formatted")` string of the registered
  * query against the given data dir. Unlike [[Plans]] (the curated
  * PLANS.md narrative), this takes the query list and output naming
  * from the command line so before/after pairs can be generated from
  * two checkouts of the tree.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.registerAll(spark) // the session a real run plans under
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"[plandump] $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
