package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Core relational operator surface (SURVEY.md §2.1: scans, projections,
  * filters, joins of every flavor, aggregations, window functions, sorts,
  * top-k, set ops, scalar functions).
  *
  * The reference (`/root/reference/regionSpout.go`) has no SQL layer; this
  * surface is mandated by BASELINE.json's north star. Every query here is
  * declarative DataFrame API so Catalyst gets full freedom: predicate
  * pushdown and column pruning reach the parquet scans, small dimensions
  * are broadcast, and AQE re-plans shuffles at runtime.
  *
  * Scale notes (100 TB design):
  *  - Dimension tables (region/nation/supplier/part) are broadcast —
  *    explicitly via `broadcast()` where the plan benefits; the big fact
  *    (lineitem) is never shuffled for those joins.
  *  - Fact-to-fact joins (orders⋈lineitem) shuffle on the join key; at
  *    scale both sides would be bucketed by orderkey to make this a
  *    shuffle-free sort-merge join. AQE skew-join splits hot keys.
  *  - Aggregations are partial (map-side combine) before the exchange —
  *    automatic with groupBy/agg.
  *
  * Doubles are rounded at the output boundary so results hash-compare
  * against the DuckDB oracle despite summation-order differences.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1-style pricing summary: filter → partial+final hash agg → sort. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection; predicates and column pruning push to the scan. */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  val q02Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q3-style: 3-way join, agg, deterministic top-10. */
  def q03JoinTopK(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < ts("1995-03-15 00:00:00"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > ts("1995-03-15 00:00:00"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Left-semi join (EXISTS): orders with at least one heavy lineitem. */
  def q04SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val heavy = Tables.lineitem(spark, dir).filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"))
    o.join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val q05Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Star join with broadcast dimensions: revenue per nation.
    * lineitem (fact) never shuffles for the dim joins — supplier/nation/
    * region are broadcast; only the final small agg exchanges. */
  def q06StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q06Sql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Window functions: running revenue + row_number per supplier.
    * Deterministic intra-partition order via (shipdate, orderkey,
    * linenumber, extendedprice) — the synthetic data has duplicate
    * (orderkey, linenumber) rows with different prices, so the price
    * tiebreak makes any remaining ties indistinguishable in both the
    * displayed columns and the summed value. */
  def q07WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    l.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        round(sum(col("l_extendedprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_rev"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val q07Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  row_number() OVER w AS rn,
      |  round(sum(l_extendedprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice)
      |ORDER BY l_suppkey, rn""".stripMargin

  /** Top-k per group via row_number: 3 priciest orders per customer. */
  def q08TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q08Sql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Set operations: UNION / INTERSECT / EXCEPT on customer keys. */
  def q09SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val rich = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    building.union(rich).distinct()
      .intersect(c.filter(col("c_acctbal") > 0.0).select(col("c_custkey")))
      .except(auto)
      .orderBy(col("c_custkey"))
  }

  val q09Sql: String =
    """SELECT c_custkey FROM (
      |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |   UNION
      |   SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 0.0
      |  EXCEPT
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      |ORDER BY c_custkey""".stripMargin

  /** Distinct aggregation: exact count-distinct per group (the HLL
    * `approx_count_distinct` variant is benched separately — approximate
    * results can't hash-match an oracle). */
  def q10DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(min(col("o_totalprice")), 2).as("min_price"))
      .orderBy(col("o_orderpriority"))
  }

  val q10Sql: String =
    """SELECT o_orderpriority,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders,
      |  round(max(o_totalprice), 2) AS max_price,
      |  round(min(o_totalprice), 2) AS min_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** ROLLUP (multi-level agg in one pass); NULLS FIRST pinned for parity. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val q11Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Scalar-function gallery: string / date / math, all codegen built-ins. */
  def q12ScalarFns(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 1000L)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        upper(col("o_orderstatus")).as("status_u"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).as("prio_len"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
        round(col("o_totalprice") / 1000.0, 3).as("price_k"),
        floor(col("o_totalprice")).as("price_floor"),
        ceil(col("o_totalprice")).as("price_ceil"),
        round(sqrt(col("o_totalprice")), 4).as("price_sqrt"),
        (col("o_orderkey") % 7L).as("key_mod7"),
        greatest(col("o_totalprice"), lit(50000.0)).as("price_hi"),
        least(col("o_totalprice"), lit(50000.0)).as("price_lo"),
        when(col("o_totalprice") > 150000.0, "big")
          .when(col("o_totalprice") > 50000.0, "mid")
          .otherwise("small").as("bucket"))
      .orderBy(col("o_orderkey"))
  }

  val q12Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dy,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
      |  upper(o_orderstatus) AS status_u,
      |  substring(o_orderpriority, 1, 1) AS prio_code,
      |  CAST(length(o_orderpriority) AS INT) AS prio_len,
      |  o_orderstatus || '-' || o_orderpriority AS status_prio,
      |  round(o_totalprice / 1000.0, 3) AS price_k,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
      |  round(sqrt(o_totalprice), 4) AS price_sqrt,
      |  o_orderkey % 7 AS key_mod7,
      |  greatest(o_totalprice, 50000.0) AS price_hi,
      |  least(o_totalprice, 50000.0) AS price_lo,
      |  CASE WHEN o_totalprice > 150000.0 THEN 'big'
      |       WHEN o_totalprice > 50000.0 THEN 'mid'
      |       ELSE 'small' END AS bucket
      |FROM orders
      |WHERE o_orderkey < 1000
      |ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from a string column (events.props is JSON-in-string,
    * mirroring the reference's JSON-in-JSON envelope, regionSpout.go:50,87). */
  def q13JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
  }

  val q13Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
      |FROM events
      |GROUP BY 1
      |ORDER BY k""".stripMargin

  // --------------------------------------------------------------- q106
  /** Semi-structured VARIANT shredding (Spark 4's answer to JSON-string
    * columns): `parse_json` once into the binary VARIANT encoding, then
    * typed path extraction with `variant_get` / `try_variant_get` —
    * versus q13's per-access `get_json_object` string re-parse. At
    * 100 TB the difference is structural: VARIANT parses each payload
    * once (and lakehouse writers shred hot paths into columns the scan
    * can prune), while get_json_object re-tokenizes the string for
    * every extracted path. try_variant_get is the schema-drift guard:
    * a missing/mistyped path degrades to NULL (audited in the output)
    * instead of failing the pipeline.
    *
    * Determinism: integer extraction and exact counts only. */
  def q106VariantShred(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(parse_json(col("props")).as("v"))
      .select(
        variant_get(col("v"), "$.k", "int").as("k"),
        try_variant_get(col("v"), "$.missing", "int").as("missing"))
      // floor(k/10.0), NOT integer `div`: div truncates toward zero while
      // DuckDB's `//` floors, so the two diverge on negative k (div(-5,10)=0
      // vs -5//10=-1). Floor-before-cast on BOTH sides is the engine-parity
      // discipline q88/q76 established; current data has k ≥ 0 but the
      // operator shouldn't rely on that invariant.
      .groupBy(floor(col("k") / 10.0).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(when(col("missing").isNotNull, lit(1)).otherwise(lit(0)))
          .as("n_drifted"))
      .orderBy(col("bucket"))
  }

  val q106Sql: String =
    """SELECT FLOOR(CAST(json_extract_string(props, '$.k') AS INT) / 10.0)::INT AS bucket,
      |  count(*) AS n,
      |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
      |  sum(CASE WHEN json_extract_string(props, '$.missing') IS NOT NULL
      |      THEN 1 ELSE 0 END)::BIGINT AS n_drifted
      |FROM events
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** Conditional aggregation (TPC-H Q14 style): promo revenue share. */
  def q14ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) * 100.0 /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("promo_revenue_pct"))
  }

  val q14Sql: String =
    """SELECT round(
      |  sum(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
      |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** GROUP BY + HAVING: suppliers above a revenue threshold. */
  def q15Having(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_rev"))
      .filter(col("total_rev") > 1000000.0)
      .orderBy(col("l_suppkey"))
  }

  val q15Sql: String =
    """SELECT l_suppkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING round(sum(l_extendedprice * (1 - l_discount)), 2) > 1000000.0
      |ORDER BY l_suppkey""".stripMargin

  /** Scalar-subquery pattern: suppliers richer than their nation's average
    * (expressed as a broadcast join against the per-nation aggregate). */
  def q16AboveNationAvg(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val nationAvg = s.groupBy(col("s_nationkey").as("nk"))
      .agg(avg(col("s_acctbal")).as("nation_avg"))
    s.join(broadcast(nationAvg), col("s_nationkey") === col("nk"))
      .filter(col("s_acctbal") > col("nation_avg"))
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        round(col("s_acctbal"), 2).as("acctbal"),
        round(col("nation_avg"), 4).as("nation_avg"))
      .orderBy(col("s_suppkey"))
  }

  val q16Sql: String =
    """SELECT s_suppkey, s_name, s_nationkey,
      |  round(s_acctbal, 2) AS acctbal,
      |  round(nation_avg, 4) AS nation_avg
      |FROM supplier
      |JOIN (SELECT s_nationkey AS nk, avg(s_acctbal) AS nation_avg
      |      FROM supplier GROUP BY s_nationkey) t ON s_nationkey = nk
      |WHERE s_acctbal > nation_avg
      |ORDER BY s_suppkey""".stripMargin

  /** UNION ALL then aggregate: two event slices recombined. */
  def q17UnionAllAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
    val purchases = e.filter(col("event_type") === "purchase")
    clicks.unionAll(purchases)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))
  }

  val q17Sql: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM (SELECT * FROM events WHERE event_type = 'click'
      |      UNION ALL
      |      SELECT * FROM events WHERE event_type = 'purchase')
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Date functions over event time: trunc / diff / add. */
  def q18DateFns(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("event_id") < 500L)
      .select(
        col("event_id"),
        date_trunc("day", col("ts")).as("day_start"),
        date_trunc("hour", col("ts")).as("hour_start"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("days_since"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("ts_plus_day"),
        hour(col("ts")).as("hr"),
        minute(col("ts")).as("mi"))
      .orderBy(col("event_id"))
  }

  val q18Sql: String =
    """SELECT event_id,
      |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
      |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
      |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
      |  ts + INTERVAL 1 DAY AS ts_plus_day,
      |  CAST(hour(ts) AS INT) AS hr,
      |  CAST(minute(ts) AS INT) AS mi
      |FROM events
      |WHERE event_id < 500
      |ORDER BY event_id""".stripMargin

  /** CUBE: all grouping combinations in one pass. */
  def q42Cube(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  val q42Sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_extendedprice), 2) AS total
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** GROUPING SETS through the ANSI SQL front door (spark.sql over
    * registered views) — the engine's second entry path next to the
    * DataFrame API; both compile to the same expand+aggregate plan. */
  def q43GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val q43Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Full outer join of two aggregates with deliberately partial overlap. */
  def q44FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 7000.0)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_rich_cust"))
    val supp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 7000.0)
      .groupBy(col("s_nationkey").as("nk2")).agg(count(lit(1)).as("n_rich_supp"))
    cust.join(supp, col("nk") === col("nk2"), "full_outer")
      .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
        coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
        coalesce(col("n_rich_supp"), lit(0L)).as("n_rich_supp"))
      .orderBy(col("nationkey"))
  }

  val q44Sql: String =
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_rich_cust
      |  FROM customer WHERE c_acctbal > 7000.0 GROUP BY c_nationkey),
      |s AS (SELECT s_nationkey AS nk2, count(*) AS n_rich_supp
      |  FROM supplier WHERE s_acctbal > 7000.0 GROUP BY s_nationkey)
      |SELECT coalesce(nk, nk2) AS nationkey,
      |  coalesce(n_rich_cust, 0) AS n_rich_cust,
      |  coalesce(n_rich_supp, 0) AS n_rich_supp
      |FROM c FULL OUTER JOIN s ON nk = nk2
      |ORDER BY nationkey""".stripMargin

  /** TPC-H Q5-style (local-supplier revenue per nation) entirely through
    * spark.sql — multi-join ANSI SQL over registered views. */
  def q45SqlTpch5(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(s"${t}_v"))
    spark.sql(
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer_v, orders_v, lineitem_v, supplier_v, nation_v, region_v
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  // ---------------------------------------------------------------- q57
  /** Window-function closure: explicit ROWS frame (3-order moving avg),
    * RANGE-over-interval frame (30-day trailing spend), offset functions
    * (lag/lead), and distribution functions (ntile, percent_rank) in one
    * pass — one shuffle on the partition key serves every window because
    * all six share the same (custkey | orderdate, orderkey) ordering.
    * Ratios of small integers (percent_rank) and short-frame averages get
    * the +1e-9 pre-round nudge; ties inside a RANGE frame are peers in
    * both engines so the interval sum is order-free. */
  def q57WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS mavg3,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) + 1e-9, 2) AS spend30d,
        |  lag(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_order,
        |  ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS quartile,
        |  round(percent_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) + 1e-9, 6) AS pr
        |FROM orders_v
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  }

  val q57Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS mavg3,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) + 1e-9, 2) AS spend30d,
      |  lag(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |  lead(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS next_order,
      |  ntile(4) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS quartile,
      |  round(percent_rank() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) + 1e-9, 6) AS pr
      |FROM orders
      |WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  val q45Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** PIVOT: customers per (nation, market segment) as a wide table. The
    * explicit value list keeps the plan single-pass (no distinct-values
    * pre-query) — mandatory at scale. */
  def q49Pivot(spark: SparkSession, dir: String): DataFrame = {
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .pivot("c_mktsegment", segments)
      .agg(count(lit(1)))
      .na.fill(0L, segments)
      .orderBy(col("c_nationkey"))
  }

  val q49Sql: String =
    """SELECT c_nationkey,
      |  count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
      |  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS "BUILDING",
      |  count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS "FURNITURE",
      |  count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
      |  count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS "MACHINERY"
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Correlated EXISTS / NOT EXISTS through the ANSI SQL entry path —
    * Catalyst rewrites both into the same semi/anti join plans as
    * q04/q05's DataFrame forms (left_semi / left_anti after
    * RewritePredicateSubquery); this gates the SQL front door for
    * subquery predicates. */
  def q67ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders_v o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F'
        |                    AND o2.o_totalprice < 50000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q67Sql: String =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F'
      |                    AND o2.o_totalprice < 50000.0)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q103
  /** Recursive CTE (ANSI `WITH RECURSIVE`, Spark 4's engine-native
    * recursion): a monthly calendar spine generated by LINEAR recursion
    * from min to max order month, left-joined against high-value orders
    * so months with no qualifying order surface as explicit zero rows —
    * the gaps-filling pattern every revenue dashboard needs (a plain
    * GROUP BY silently drops empty months).
    *
    * Scale shape: the recursion is one row per month (bounded by the
    * calendar, ~80 iterations here, never by the data) — each step is a
    * 1-row frame, and the only data-sized work is the single
    * aggregate-after-join on the month key. Linear recursion is the
    * recursive-CTE form that scales; Spark 4.1 does not yet support
    * UNION-dedup recursion, so graph reachability stays with q81's
    * checkpointed frontier loop (UNION ALL path enumeration on a dense
    * graph is exponential — a deliberate non-use).
    *
    * Determinism: calendar arithmetic on first-of-month DATEs (both
    * engines add calendar months exactly), decimal-rounded revenue,
    * exact counts. */
  def q103RecursiveSpine(spark: SparkSession, dir: String): DataFrame = {
    // Recursion headroom is DATA-dependent: one level per month between
    // min and max o_orderdate (~80 on this corpus vs Spark's default
    // level cap of 100 — a wider date range would throw, not degrade).
    // Pin the limit to a century's worth of months explicitly so the
    // operator's failure bound is its own documented constant, not the
    // engine default's accident. (The no-cap alternative — generate the
    // spine with sequence()/explode — is the right call when the spine
    // can be unbounded; here the linear-recursion form is the point.)
    // SCOPED via a session clone (round-6 ADVICE — the set used to leak
    // into every later query on the shared session): `newSession` shares
    // the SparkContext/cache but isolates SQLConf + temp views, and a
    // finally-restore would be wrong here anyway — the conf is read when
    // the lazy plan EXECUTES, which is after this function returns.
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.cteRecursionLevelLimit", "1200")
    Tables.orders(scoped, dir).createOrReplaceTempView("orders_v")
    scoped.sql(
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE) AS lo,
        |         CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE) AS hi
        |  FROM orders_v),
        |spine AS (
        |  SELECT lo AS mo, hi FROM bounds
        |  UNION ALL
        |  SELECT CAST(mo + INTERVAL '1' MONTH AS DATE), hi FROM spine WHERE mo < hi
        |)
        |SELECT s.mo AS month,
        |  count(o.o_orderkey) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0) + 1e-9, 2) AS revenue
        |FROM spine s LEFT JOIN orders_v o
        |  ON CAST(date_trunc('MONTH', o.o_orderdate) AS DATE) = s.mo
        |  AND o.o_totalprice > 450000.0
        |GROUP BY s.mo
        |ORDER BY s.mo""".stripMargin)
  }

  val q103Sql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT date_trunc('month', min(o_orderdate))::DATE AS lo,
      |         date_trunc('month', max(o_orderdate))::DATE AS hi
      |  FROM orders),
      |spine AS (
      |  SELECT lo AS mo, hi FROM bounds
      |  UNION ALL
      |  SELECT (mo + INTERVAL 1 MONTH)::DATE, hi FROM spine WHERE mo < hi
      |)
      |SELECT s.mo AS month,
      |  count(o.o_orderkey) AS n_orders,
      |  round(coalesce(sum(o.o_totalprice), 0) + 1e-9, 2) AS revenue
      |FROM spine s LEFT JOIN orders o
      |  ON date_trunc('month', o.o_orderdate)::DATE = s.mo
      |  AND o.o_totalprice > 450000.0
      |GROUP BY s.mo
      |ORDER BY s.mo""".stripMargin

  // --------------------------------------------------------------- q105
  /** Null-aware anti join — `NOT IN (subquery)` over a NULLABLE column,
    * the one join variant with genuinely different semantics from q05's
    * anti join (NOT EXISTS): a single NULL in the subquery empties the
    * result, and a NULL probe row never qualifies. The subquery column
    * is made NULLABLE BY TYPE via nullif(o_custkey, -1) — null-free in
    * this data (keys are positive), so the result is the meaningful
    * complement set, but the planner cannot prove that and must emit
    * the null-aware plan. The all-nulls branch semantics (one real NULL
    * empties the result) is pinned by a spec on synthetic rows.
    *
    * Spark plans single-column NOT IN as a BroadcastHashJoin with
    * isNullAwareAntiJoin=true (pinned in PlanShapeSpec): O(1) hash
    * probes plus a global has-null check, instead of the legacy
    * BroadcastNestedLoopJoin. Null-aware anti stays broadcast-only by
    * design — the null check is a global property, so the build side
    * MUST be visible in full to every probe partition; at 100 TB you
    * rewrite to NOT EXISTS when the subquery is fact-sized, which is
    * exactly why both forms are in the surface. */
  def q105NotIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v
        |WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1)
        |  FROM orders_v
        |  WHERE o_totalprice < 100000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q105Sql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT nullif(o_custkey, -1)
      |  FROM orders
      |  WHERE o_totalprice < 100000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Bag-semantics set operations (q09 covers the DISTINCT forms):
    * INTERSECT ALL / EXCEPT ALL keep multiplicities — per-key kept count
    * is min/differenced, which Spark plans as a counted aggregate, not a
    * pair join. Summarized per customer key so the oracle stays
    * hash-exact. */
  def q68SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val big = o.filter(col("o_totalprice") > 150000.0).select(col("o_custkey"))
    val both = urgent.intersectAll(big).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_both"))
    val onlyU = urgent.exceptAll(big).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_only_urgent"))
    both.join(onlyU, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        coalesce(col("n_only_urgent"), lit(0L)).as("n_only_urgent"))
      .orderBy(col("o_custkey"))
  }

  val q68Sql: String =
    """WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0),
      |ia AS (SELECT o_custkey, count(*) AS n_both
      |  FROM (SELECT o_custkey FROM u INTERSECT ALL SELECT o_custkey FROM b)
      |  GROUP BY o_custkey),
      |ea AS (SELECT o_custkey, count(*) AS n_only_urgent
      |  FROM (SELECT o_custkey FROM u EXCEPT ALL SELECT o_custkey FROM b)
      |  GROUP BY o_custkey)
      |SELECT coalesce(ia.o_custkey, ea.o_custkey) AS o_custkey,
      |  coalesce(ia.n_both, 0) AS n_both,
      |  coalesce(ea.n_only_urgent, 0) AS n_only_urgent
      |FROM ia FULL OUTER JOIN ea ON ia.o_custkey = ea.o_custkey
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Cohort retention: users grouped by first-activity day, counted again
    * on each later activity day (offset 0–7). The standard product-
    * analytics matrix, and a distinct plan shape from the window queries:
    * a per-user min (cohort assignment) joined back to the activity
    * fact, then a two-key distinct count. Scale: both aggregates are
    * partial-before-exchange on user_id; the join back is key-aligned
    * with the cohort aggregate (one shuffle reused), never a pair
    * explosion. All-integer outputs hash exactly. */
  def q69CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    days.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val q69Sql: String =
    """WITH days AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
      |cohort AS (SELECT user_id, min(d) AS cohort_day FROM days GROUP BY user_id)
      |SELECT c.cohort_day, date_diff('day', c.cohort_day, days.d) AS day_offset,
      |  count(DISTINCT days.user_id) AS n_users
      |FROM days JOIN cohort c USING (user_id)
      |WHERE date_diff('day', c.cohort_day, days.d) <= 7
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Declarative data-quality audit (the dbt-test / Deequ constraint
    * suite as one query): per rule, how many rows violate it and the
    * violation rate. Four value rules are ONE conditional aggregate per
    * table — a single scan computes every rule on that table, no matter
    * how many rules pile up — and the two referential rules are
    * left-anti joins (q05's shape; the customer side broadcasts, the
    * order-key side is co-partitioned). Clean-by-construction rules
    * (the FK checks on this corpus) report 0 — that's the audit
    * asserting integrity, not a vacuous row.
    *
    * Scale: rule evaluation is embarrassingly partial — every rule is
    * a map-side predicate feeding sum(case), so the whole audit costs
    * one pass per audited table plus the anti-joins. */
  def q84QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def audit(df: DataFrame, rule: String, bad: Column): DataFrame =
      df.agg(sum(when(bad, 1L).otherwise(0L)).as("violations"),
          count(lit(1)).as("total"))
        .select(lit(rule).as("rule"), col("violations"), col("total"))
    val cust = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val ev = Tables.events(spark, dir)
    val docs = Tables.documents(spark, dir)
    val orphanOrders = ord.join(broadcast(cust.select(col("c_custkey"))),
      col("o_custkey") === col("c_custkey"), "left_anti")
    val orphanLines = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    // the lineitem orphan rule reuses the total already computed by the
    // value-rule aggregate on the same table (localCheckpoint: a 1-row
    // frame) — recounting would cost one more full pass over the
    // largest table; orders has no value rule, so its single count
    // aggregate is that table's one pass
    val liRule = audit(li, "lineitem_bulk_quantity", col("l_quantity") > 45)
      .localCheckpoint(true)
    audit(cust, "customer_negative_acctbal", col("c_acctbal") < 0)
      .union(audit(docs, "documents_non_english", col("lang") =!= "en"))
      .union(audit(ev, "events_value_outlier", col("value") > 400))
      .union(liRule)
      .union(orphanLines.agg(count(lit(1)).as("violations"))
        .crossJoin(liRule.select(col("total")))
        .select(lit("lineitem_orphan_orderkey").as("rule"),
          col("violations"), col("total")))
      .union(orphanOrders.agg(count(lit(1)).as("violations"))
        .crossJoin(ord.agg(count(lit(1)).as("total")))
        .select(lit("orders_orphan_custkey").as("rule"),
          col("violations"), col("total")))
      .withColumn("rate",
        round(col("violations").cast("double") / col("total") + 1e-9, 6))
      .orderBy(col("rule"))
  }

  val q84Sql: String =
    """WITH u AS (
      |  SELECT 'customer_negative_acctbal' AS rule,
      |    sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)::BIGINT AS violations,
      |    count(*) AS total FROM customer
      |  UNION ALL SELECT 'documents_non_english',
      |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT, count(*) FROM documents
      |  UNION ALL SELECT 'events_value_outlier',
      |    sum(CASE WHEN value > 400 THEN 1 ELSE 0 END)::BIGINT, count(*) FROM events
      |  UNION ALL SELECT 'lineitem_bulk_quantity',
      |    sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)::BIGINT, count(*) FROM lineitem
      |  UNION ALL SELECT 'lineitem_orphan_orderkey',
      |    (SELECT count(*) FROM lineitem l
      |      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |    (SELECT count(*) FROM lineitem)
      |  UNION ALL SELECT 'orders_orphan_custkey',
      |    (SELECT count(*) FROM orders o
      |      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |    (SELECT count(*) FROM orders))
      |SELECT rule, violations, total,
      |  round(violations::DOUBLE / total + 1e-9, 6) AS rate
      |FROM u ORDER BY rule""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Skyline (Pareto frontier) of orders on (total price ↓ better,
    * total quantity ↑ better): an order survives iff no other order is
    * both cheaper-or-equal and higher-quantity (with per-price ties
    * resolved to the max-quantity, min-key row first, so equal-price
    * dominated rows fall out). Sort-based 2-D skyline: after sorting by
    * price, a row is on the frontier iff its quantity beats every
    * strictly-cheaper row's max — one running-max window, never the
    * O(n²) dominance self-join.
    *
    * Scale shape: divide-and-conquer — the frontier pass runs FIRST
    * per price band (windows partitioned by band → parallel), and only
    * band-local survivors (tiny: each band contributes its own
    * frontier) enter the global ordered window. skyline(∪ skylines) =
    * skyline, so the two-phase plan is exact while keeping the global
    * single-partition window to frontier-sized input.
    *
    * Money is summed in decimal cents (q85's discipline) — exact,
    * order-independent, so the frontier membership can't flap on
    * double summation order. */
  def q86Skyline(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("price_c"),
        // floor() before the integral cast: Spark cast truncates, DuckDB
        // ::BIGINT rounds — floor both sides keeps parity even if a
        // future corpus carries fractional quantities
        sum(floor(col("l_quantity")).cast("long")).as("qty"))
    val perPrice = per
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("price_c")).orderBy(col("qty").desc, col("ok"))))
      .filter(col("rk") === 1).drop("rk")
    def frontier(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      df.withColumn("best_qty", max(col("qty")).over(
          w.orderBy(col("price_c")).rangeBetween(Window.unboundedPreceding, -1)))
        .filter(col("best_qty").isNull || col("qty") > col("best_qty"))
        .drop("best_qty")
    val local = frontier(perPrice.withColumn("band", expr("price_c div 1000000")),
      Window.partitionBy(col("band"))).drop("band")
    frontier(local, Window.partitionBy())
      .orderBy(col("price_c"))
  }

  val q86Sql: String =
    """WITH per_order AS (SELECT l_orderkey AS ok,
      |    (sum(l_extendedprice::DECIMAL(18,2)) * 100)::BIGINT AS price_c,
      |    sum(floor(l_quantity)::BIGINT)::BIGINT AS qty
      |  FROM lineitem GROUP BY 1),
      |best AS (SELECT ok, price_c, qty,
      |    row_number() OVER (PARTITION BY price_c ORDER BY qty DESC, ok) AS rk
      |  FROM per_order),
      |cand AS (SELECT ok, price_c, qty FROM best WHERE rk = 1),
      |sk AS (SELECT ok, price_c, qty,
      |    max(qty) OVER (ORDER BY price_c
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_qty
      |  FROM cand)
      |SELECT ok, price_c, qty FROM sk
      |WHERE best_qty IS NULL OR qty > best_qty
      |ORDER BY price_c""".stripMargin

  // --------------------------------------------------------------- q111
  /** Table-version diff — the backfill/migration validation pass: given
    * two versions of a keyed table, classify every key as unchanged /
    * updated / deleted / inserted and report per-status counts plus the
    * summed absolute price drift of the updates. This is the check a
    * lakehouse pipeline runs after every rewrite ("did the backfill
    * change exactly what it was supposed to?"). price_drift is the
    * per-status Σ|Δprice| — the reprice delta for updates, the full
    * added/removed value for inserts/deletes, 0 for unchanged.
    * Version B here is
    * DERIVED deterministically from the orders table (keys % 11 = 0
    * deleted, % 7 = 0 repriced +10%, % 13 = 0 re-inserted under offset
    * keys) so the oracle can rebuild the identical pair of versions.
    *
    * Scale shape: ONE full-outer hash join on the key (each side
    * shuffles once; AQE picks the strategy), status classification and
    * per-row drift are map-side above it, and the output is bounded by
    * the status domain (4 rows). No collects, no windows — the diff of
    * two 100 TB table versions is exactly this plan.
    *
    * Determinism: statuses compare typed columns (no stringified row
    * hashes — double/date formatting differs across engines); drift
    * rounds PER ROW to 2 decimals (+1e-9 half-way nudge) before the
    * sum, so the aggregate is an exact sum of 2-decimal values and
    * safe to hash at any partitioning. */
  def q111TableDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
    val cols = a.columns.map(col).toSeq
    // version B: deterministic simulated rewrite
    val updated = a.filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0,
          round(col("o_totalprice") * 1.1 + 1e-9, 2))
          .otherwise(col("o_totalprice")))
    // Inserted-row keys are shifted by 1e9, which stays collision-free
    // only while max(o_orderkey) < 1e9 — true through sf≈170 (o_orderkey
    // tops out near 6M·sf·4). The oracle hardcodes the same constant, so
    // a larger corpus needs BOTH sides to derive the offset from
    // max(o_orderkey) (or widen it); below the bound the constant keeps
    // the simulated version B fully deterministic with zero extra scans.
    val inserted = a.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
    val b = updated.select(cols: _*).unionByName(inserted.select(cols: _*))
    val av = a.select(col("o_orderkey").as("key"),
      col("o_totalprice").as("price_a"), col("o_orderstatus").as("status_a"))
    val bv = b.select(col("o_orderkey").as("key"),
      col("o_totalprice").as("price_b"), col("o_orderstatus").as("status_b"))
    av.join(bv, Seq("key"), "full_outer")
      .select(
        when(col("price_a").isNull, "inserted")
          .when(col("price_b").isNull, "deleted")
          .when(col("price_a") =!= col("price_b") ||
            col("status_a") =!= col("status_b"), "updated")
          .otherwise("unchanged").as("status"),
        round(abs(coalesce(col("price_b"), lit(0.0)) -
          coalesce(col("price_a"), lit(0.0))) + 1e-9, 2).as("drift"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("drift")) + 1e-9, 2).as("price_drift"))
      .orderBy(col("status"))
  }

  val q111Sql: String =
    """WITH a AS (SELECT o_orderkey AS key, o_totalprice AS price_a,
      |    o_orderstatus AS status_a FROM orders),
      |b0 AS (SELECT o_orderkey AS key,
      |    CASE WHEN o_orderkey % 7 = 0
      |      THEN round(o_totalprice * 1.1 + 1e-9, 2) ELSE o_totalprice END AS price_b,
      |    o_orderstatus AS status_b
      |  FROM orders WHERE o_orderkey % 11 <> 0),
      |ins AS (SELECT o_orderkey + 1000000000 AS key, o_totalprice AS price_b,
      |    o_orderstatus AS status_b FROM orders WHERE o_orderkey % 13 = 0),
      |b AS (SELECT * FROM b0 UNION ALL SELECT * FROM ins),
      |d AS (SELECT
      |    CASE WHEN a.price_a IS NULL THEN 'inserted'
      |         WHEN b.price_b IS NULL THEN 'deleted'
      |         WHEN a.price_a <> b.price_b OR a.status_a <> b.status_b THEN 'updated'
      |         ELSE 'unchanged' END AS status,
      |    round(abs(coalesce(b.price_b, 0.0) - coalesce(a.price_a, 0.0)) + 1e-9, 2) AS drift
      |  FROM a FULL OUTER JOIN b ON a.key = b.key)
      |SELECT status, count(*) AS n_rows,
      |  round(sum(drift) + 1e-9, 2) AS price_drift
      |FROM d GROUP BY status ORDER BY status""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project"  -> q02FilterProject _,
    "q03_join_topk"       -> q03JoinTopK _,
    "q04_semi_join"       -> q04SemiJoin _,
    "q05_anti_join"       -> q05AntiJoin _,
    "q06_star_join"       -> q06StarJoin _,
    "q07_window_running"  -> q07WindowRunning _,
    "q08_topk_per_group"  -> q08TopKPerGroup _,
    "q09_set_ops"         -> q09SetOps _,
    "q10_distinct_agg"    -> q10DistinctAgg _,
    "q11_rollup"          -> q11Rollup _,
    "q12_scalar_fns"      -> q12ScalarFns _,
    "q13_json_extract"    -> q13JsonExtract _,
    "q14_conditional_agg" -> q14ConditionalAgg _,
    "q15_having"          -> q15Having _,
    "q16_above_nation_avg" -> q16AboveNationAvg _,
    "q17_union_all_agg"   -> q17UnionAllAgg _,
    "q18_date_fns"        -> q18DateFns _,
    "q42_cube"            -> q42Cube _,
    "q43_grouping_sets"   -> q43GroupingSets _,
    "q44_full_outer"      -> q44FullOuter _,
    "q45_sql_tpch5"       -> q45SqlTpch5 _,
    "q49_pivot"           -> q49Pivot _,
    "q67_exists_subquery" -> q67ExistsSubquery _,
    "q68_set_ops_all"     -> q68SetOpsAll _,
    "q69_cohort_retention" -> q69CohortRetention _,
    "q57_window_frames"   -> q57WindowFrames _,
    "q84_quality_audit"   -> q84QualityAudit _,
    "q86_skyline"         -> q86Skyline _,
    "q103_recursive_spine" -> q103RecursiveSpine _,
    "q105_not_in"         -> q105NotIn _,
    "q106_variant_shred"  -> q106VariantShred _,
    "q111_table_diff"     -> q111TableDiff _,
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_join_topk"       -> q03Sql,
    "q04_semi_join"       -> q04Sql,
    "q05_anti_join"       -> q05Sql,
    "q06_star_join"       -> q06Sql,
    "q07_window_running"  -> q07Sql,
    "q08_topk_per_group"  -> q08Sql,
    "q09_set_ops"         -> q09Sql,
    "q10_distinct_agg"    -> q10Sql,
    "q11_rollup"          -> q11Sql,
    "q12_scalar_fns"      -> q12Sql,
    "q13_json_extract"    -> q13Sql,
    "q14_conditional_agg" -> q14Sql,
    "q15_having"          -> q15Sql,
    "q16_above_nation_avg" -> q16Sql,
    "q17_union_all_agg"   -> q17Sql,
    "q18_date_fns"        -> q18Sql,
    "q42_cube"            -> q42Sql,
    "q43_grouping_sets"   -> q43Sql,
    "q44_full_outer"      -> q44Sql,
    "q45_sql_tpch5"       -> q45Sql,
    "q49_pivot"           -> q49Sql,
    "q67_exists_subquery" -> q67Sql,
    "q68_set_ops_all"     -> q68Sql,
    "q69_cohort_retention" -> q69Sql,
    "q57_window_frames"   -> q57Sql,
    "q84_quality_audit"   -> q84Sql,
    "q86_skyline"         -> q86Sql,
    "q103_recursive_spine" -> q103Sql,
    "q105_not_in"         -> q105Sql,
    "q106_variant_shred"  -> q106Sql,
    "q111_table_diff"     -> q111Sql,
  )
}
