package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch / approximate aggregates — the operators that keep 100 TB
  * aggregations single-pass and bounded-memory (SURVEY §2.1: HLL distinct,
  * quantiles). The reference has nothing comparable; these are mandated by
  * the extension surface.
  *
  * q39 (exact interpolated percentiles) is oracle-gated. q40 (HLL) has no
  * oracle entry on purpose: approximate answers can't hash-match an exact
  * engine — the driver records a rows-only check, and the spec bounds the
  * HLL error against the exact count instead.
  */
object Sketches {

  // ---------------------------------------------------------------- q39
  /** Exact interpolated percentiles of order value per priority (single
    * shuffle; at scale swap `percentile` for `approx_percentile` — same
    * plan shape, sketch-sized state). One `percentile(..., array(...))`
    * aggregate, not four: the quantile buffer is built and sorted once
    * per group (measured 1.27 → 0.99 s at sf0.1; the remainder is the
    * scan + group shuffle, not quantile math). */
  def q39Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))").as("ps"))
      .select(col("o_orderpriority"),
        round(element_at(col("ps"), 1), 2).as("p25"),
        round(element_at(col("ps"), 2), 2).as("p50"),
        round(element_at(col("ps"), 3), 2).as("p75"),
        round(element_at(col("ps"), 4), 2).as("p95"))
      .orderBy(col("o_orderpriority"))

  val q39Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
      |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q40
  /** HLL++ distinct counts beside the exact answer — the constant-memory
    * form of q10 at scale. No oracle (approximate); rows-only check +
    * error-bound spec. */
  def q40ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_customers"))
      .orderBy(col("o_orderpriority"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_percentiles"     -> q39Percentiles _,
    "q40_approx_distinct" -> q40ApproxDistinct _,
  )

  /** q40 intentionally absent — see object doc. */
  val oracle: Map[String, String] = Map(
    "q39_percentiles" -> q39Sql,
  )
}
