package graft

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of semantics: latest prior right row, inclusive ties, left preserved") {
    val left = Seq(
      (1L, Some(10L), ts("2024-01-01 10:00:00"), "a"),
      (2L, Some(10L), ts("2024-01-01 11:00:00"), "b"),
      (3L, Some(10L), ts("2024-01-01 09:00:00"), "early"), // before any right row
      (4L, Some(20L), ts("2024-01-01 10:30:00"), "c"),
      (5L, Some(30L), ts("2024-01-01 10:00:00"), "tie"),   // exactly at a right ts
      (6L, None, ts("2024-01-01 11:00:00"), "nullkey")     // NULL never matches
    ).toDF("id", "k", "t", "tag")
    val right = Seq(
      (Some(10L), ts("2024-01-01 09:30:00"), 100.0),
      (Some(10L), ts("2024-01-01 10:30:00"), 200.0),
      (Some(20L), ts("2024-01-01 10:00:00"), 300.0),
      (Some(30L), ts("2024-01-01 10:00:00"), 400.0),
      (None, ts("2024-01-01 09:00:00"), 999.0)             // must never attach
    ).toDF("k", "t", "v")

    val out = AsOf.asOfJoin(left, right, "k", "t", Seq("t", "v"), prefix = "last_")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Double]("last_v")).map(_.toDouble),
          Option(r.getAs[Timestamp]("last_t")))).toMap

    assert(out(1L) == ((Some(100.0), Some(ts("2024-01-01 09:30:00")))), "latest prior")
    assert(out(2L) == ((Some(200.0), Some(ts("2024-01-01 10:30:00")))), "advances with time")
    assert(out(3L) == ((None, None)), "no prior right row -> null payload (left join)")
    assert(out(4L) == ((Some(300.0), Some(ts("2024-01-01 10:00:00")))))
    assert(out(5L) == ((Some(400.0), Some(ts("2024-01-01 10:00:00")))), "equal ts is inclusive")
    assert(out(6L) == ((None, None)), "NULL keys never match (ANSI equality), row preserved")
  }

  test("as-of plan is join-free: one union, one window, one key shuffle") {
    // the bare operator on parquet-backed sides (q53 itself adds one more
    // exchange for its right-side dedup aggregate, which is input prep,
    // not the as-of core)
    val e = graft.sources.Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("p_value"))
    val q = AsOf.asOfJoin(clicks, purchases, "user_id", "ts", Seq("p_value"))
    val plan = q.queryExecution.optimizedPlan
    assert(plan.collect { case j: Join => j }.isEmpty,
      "as-of must compose via union+window, not a join")
    assert(plan.collect { case w: LWindow => w }.nonEmpty)
    val exchanges = q.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly one key shuffle, got $exchanges")
  }

  test("q76: interval flattening conserves (1 + transit-days) per lineitem") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.AsOf.q76IntervalJoin(spark, sf)
    val flattened = out.agg(sum(col("n_in_transit"))).collect()(0).getLong(0)
    val expected = graft.sources.Tables.lineitem(spark, sf)
      .select((lit(1) + col("l_quantity").cast("int") % 14).as("d"))
      .agg(sum(col("d"))).collect()(0).getLong(0)
    assert(flattened == expected,
      s"every interval contributes length+1 day rows: $flattened vs $expected")
  }

}
