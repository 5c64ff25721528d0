package graft

/** Dev tool: Verify a comma-separated SUBSET of registered
  * queries against their DuckDB oracles via tools/compare.py —
  * `runMain graft.VerifySubset q1,q2 <sfDir> <outDir>` then
  * `python3 tools/compare.py <sfDir> <outDir>`. */
import org.apache.spark.sql.SparkSession
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args(1); val out = args(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.registerAll(spark)
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$out/$n")
      println(s"[subset] wrote $n")
    }
    val sqls = names.map(n => s""""$n": ${ujsonStr(graft.SparkEntry.oracleSql(n))}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      sqls.mkString("{", ",", "}").getBytes("UTF-8"))
    spark.stop()
  }
  def ujsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
}
