package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each loader reads one parquet table from the given scale-factor
  * directory. Reads are plain `spark.read.parquet` so Catalyst pushes
  * filters/projections into the scan (verify with `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame     = t(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = t(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")

  /** `events.parquet`'s `ts` physical type has varied across driver
    * testdata generations, so the loader normalizes BY SCHEMA to a
    * session-zoned micros TIMESTAMP either way:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]), so nanos are read as raw longs
    *    (`spark.sql.legacy.parquet.nanosAsLong`) and converted with
    *    *integer* division — `ts div 1000` — because a double-precision
    *    division of an epoch-nanos value (~1.7e18 > 2^53) silently
    *    loses microseconds. Matches DuckDB's own ns→us truncation.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *    TIMESTAMP_NTZ; cast to TIMESTAMP — identical wall-clock values
    *    under the engine's fixed UTC session zone, which is also how
    *    DuckDB reads the same file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
