package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's predicate
  * pushdown + column pruning reach the scan; callers select/filter on the
  * returned DataFrame and the parquet reader only materializes what the
  * plan needs. At 100 TB these same loaders point at a partitioned table
  * root (e.g. events/date=YYYY-MM-DD/region=ID) and partition pruning applies.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // self-heal: queries use graft_dot/graft_h60, which a session built
    // outside graft.Session (a harness-owned one) won't have registered
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it surfaces as LongType
    * nanos. Convert to a microsecond timestamp (integer `div`, not `/`:
    * 2024-epoch nanos ≈ 1.7e18 exceeds double's 53-bit mantissa, so float
    * division would corrupt timestamps). DuckDB truncates ns→µs the same
    * way, keeping oracle parity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      // a session without graft.Session's inferTimestampNTZ=false pin
      // (harness-owned) reads the staged isAdjustedToUTC=0 annotation as
      // NTZ; under the UTC session timezone the cast re-labels the same
      // wall-clock instant, restoring the TimestampType contract every
      // consumer (and the DuckDB oracle) assumes
      raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
