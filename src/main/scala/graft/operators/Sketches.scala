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

  // ---------------------------------------------------------------- q91
  /** Sketch MERGEABILITY audit — q85's incremental-view story extended
    * to approximate state, which is how 100 TB dashboards actually stay
    * fresh: per-slice Datasketches-HLL sketches (the persisted partial
    * state, one binary blob per slice) are union-merged and compared
    * against the sketch built in one pass over the whole corpus, plus
    * the exact distinct count. base ∪ delta never rescans base — a new
    * slice's sketch merges into the stored state in O(sketch) time.
    *
    * Emits one audit row: merged estimate, whole-corpus estimate, the
    * exact count, whether merge reproduced the one-pass estimate
    * EXACTLY, and the relative error vs exact. The boolean is usually
    * false by design of the sketch library, and that is the point of
    * auditing it: Datasketches HLL carries a HIP accumulator that
    * one-pass aggregation uses but union-merging must discard (it
    * falls back to the raw harmonic estimator), so merged and whole
    * estimates legitimately differ by a little while BOTH stay inside
    * the configured error bounds — the invariant a 100 TB dashboard
    * actually relies on, and the one SketchesSpec pins (measured at
    * sf0.01: merged 1488 vs whole 1494 vs exact 1500). No oracle on
    * purpose (approximate answers can't hash-match an exact engine —
    * q40's rule); the driver records a rows-only check. */
  def q91SketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderdate"))
    val perSlice = o
      .withColumn("slice",
        when(col("o_orderdate") < cutoff, "base").otherwise("delta"))
      .groupBy(col("slice"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perSlice
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_estimate"))
    val whole = o.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("whole_estimate"),
      countDistinct(col("o_custkey")).as("exact_customers"))
    merged.crossJoin(whole)
      .select(col("merged_estimate"), col("whole_estimate"), col("exact_customers"),
        (col("merged_estimate") === col("whole_estimate")).as("merge_matches_whole"),
        round(abs(col("merged_estimate") - col("exact_customers"))
          / col("exact_customers"), 6).as("rel_err"))
  }

  // ---------------------------------------------------------------- q98
  /** Sketch-based JOIN-KEY overlap estimation — the optimizer statistic
    * behind join planning at 100 TB: how many distinct customer keys do
    * `orders` and `customer` share? Exact inclusion–exclusion over HLL
    * sketches (|A∩B| ≈ est(A) + est(B) − est(A∪B)) needs one scan per
    * side and constant memory, vs the exact semi-join's full shuffle.
    * One audit row: per-side estimates, union estimate, derived overlap
    * estimate, the exact overlap, and relative error. Rows-only gate
    * (approximate — q40's rule); SketchesSpec bounds the error. */
  def q98JoinCardEstimate(spark: SparkSession, dir: String): DataFrame = {
    val oKeys = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val cKeys = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
    val sk = oKeys.agg(hll_sketch_agg(col("k")).as("sk"))
      .unionAll(cKeys.agg(hll_sketch_agg(col("k")).as("sk")))
    val ests = oKeys.agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est_orders"))
      .crossJoin(cKeys.agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est_customer")))
      .crossJoin(sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union")))
    val exact = cKeys.join(oKeys, cKeys("k") === oKeys("k"), "left_semi")
      .agg(countDistinct(col("k")).as("exact_overlap"))
    ests.crossJoin(exact)
      .select(col("est_orders"), col("est_customer"), col("est_union"),
        (col("est_orders") + col("est_customer") - col("est_union")).as("est_overlap"),
        col("exact_overlap"),
        round(abs(col("est_orders") + col("est_customer") - col("est_union")
          - col("exact_overlap")).cast("double") / col("exact_overlap"), 6)
          .as("rel_err"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_percentiles"     -> q39Percentiles _,
    "q40_approx_distinct" -> q40ApproxDistinct _,
    "q59_profile"         -> q59Profile _,
    "q91_sketch_merge"    -> q91SketchMerge _,
    "q98_join_card_estimate" -> q98JoinCardEstimate _,
  )

  /** q40, q91, and q98 intentionally absent — see their docs (approximate). */
  val oracle: Map[String, String] = Map(
    "q39_percentiles" -> q39Sql,
    "q59_profile"     -> q59Sql,
  )
}
