package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the session-level semantics the whole engine (and the DuckDB
  * oracle) assumes, so an environment drift can't silently flip them.
  *
  * Round 9 incident this exists to prevent: the staged testdata was
  * re-written with parquet timestamps annotated `isAdjustedToUTC=0`,
  * which Spark 4's default `inferTimestampNTZ.enabled=true` surfaces as
  * TIMESTAMP_NTZ — `Row.getAs[java.sql.Timestamp]` then throws
  * ClassCastException(LocalDateTime) in three specs while every oracle
  * gate kept passing. The engine pins inference OFF in
  * `Session.builder`; this spec fails loudly if either the pin or the
  * resulting column type ever changes again.
  */
class SessionContractSpec extends SparkSpec {

  test("parquet NTZ inference is pinned off in the engine session") {
    assert(spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false",
      "Session.builder must pin NTZ inference off — timestamp semantics " +
        "must come from the engine, not the staging annotation")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("events.ts loads as TimestampType (instant semantics) at every staged SF") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t = graft.sources.Tables.events(spark, dir).schema("ts").dataType
      assert(t == TimestampType, s"$dir events.ts read as $t — staging drift")
    }
    // rows must surface java.sql.Timestamp, the accessor contract the
    // windowing/streaming specs rely on
    val r = graft.sources.Tables.events(spark, sf).select("ts").head
    assert(r.get(0).isInstanceOf[java.sql.Timestamp],
      s"ts row value is ${r.get(0).getClass} — NTZ leaked through")
  }

  test("NTZ-annotated parquet still yields TimestampType through Tables.events") {
    // simulate a harness-owned session (no pin): write an NTZ-typed ts
    // and prove the Tables.events coercion restores TimestampType
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val df = Seq(("2024-01-01T00:00:00", 1L)).toDF("s", "event_id")
      .withColumn("ts", org.apache.spark.sql.functions.col("s").cast(TimestampNTZType))
      .drop("s")
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      val got = graft.sources.Tables.events(spark, tmp)
      assert(got.schema("ts").dataType == TimestampType)
      assert(got.select("ts").head.get(0).isInstanceOf[java.sql.Timestamp])
    } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
  }
}
