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

  // ---------------------------------------------------------------- q59
  /** Data-profiling audit — the table-health scan a pipeline runs before
    * trusting an input: per column, row/null/distinct counts and value
    * range, computed in ONE pass over the fact table (a single aggregate
    * produces every measure; `stack` unpivots the wide row to one row
    * per column). At 100 TB this is one scan + a 1-row-per-column
    * result — swap countDistinct for approx_count_distinct to keep the
    * aggregate sketch-sized. */
  /** Columns profiled by q59 — single source of truth for the Spark
    * query and its oracle SQL (diverging copies would silently compare
    * different profiles). */
  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  def q59Profile(spark: SparkSession, dir: String): DataFrame = {
    val cols = profileCols
    val li = Tables.lineitem(spark, dir)
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))): _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max").mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${cols.length}, $stackArgs) AS (column_name, n_non_null, n_distinct, vmin, vmax)"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("vmin"), col("vmax"))
      .orderBy(col("column_name"))
  }

  val q59Sql: String = {
    val selects = profileCols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |  min($c) AS vmin, max($c) AS vmax FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$selects
       |) ORDER BY column_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_percentiles"     -> q39Percentiles _,
    "q40_approx_distinct" -> q40ApproxDistinct _,
    "q59_profile"         -> q59Profile _,
  )

  /** q40 intentionally absent — see object doc. */
  val oracle: Map[String, String] = Map(
    "q39_percentiles" -> q39Sql,
    "q59_profile"     -> q59Sql,
  )
}
