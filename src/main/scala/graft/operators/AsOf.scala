package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** As-of (temporal) join — the canonical "operator Spark lacks": each
  * left row picks the latest right row with `right.ts <= left.ts` for its
  * key. The reference's envelope enriches events against a STATIC catalog
  * (`/root/reference/regionSpout.go:126-140`); an as-of join is the same
  * enrichment against a time-VERSIONED catalog, which is what event
  * pipelines actually face (prices, configs, user state).
  *
  * Spark-first shape — composition, not a custom physical operator
  * (SURVEY §7.3 preference (a)): tag and union both sides, then one
  * window per key ordered by (ts, side) carries the last right payload
  * forward onto each left row. ONE shuffle on the key + a per-partition
  * sort; no range-join pair explosion, no per-key collect. At 100 TB this
  * is the only as-of shape that works: cost is a sort-merge pass, state
  * is one payload struct per partition stream, and AQE skew handling
  * applies to the single exchange like any other.
  *
  * Tie semantics match DuckDB/ANSI ASOF (`l.ts >= r.ts`): at equal ts the
  * right row sorts first (side 0 < 1) and is visible to the left row.
  * Rows with no prior right row keep null payload (ASOF LEFT JOIN).
  * Multiple right rows per (key, ts) are the caller's job to dedupe —
  * "latest" is ill-defined otherwise (q53 collapses them with max).
  */
object AsOf {

  /** Left-preserving as-of join. `payload` names the right-side columns
    * to carry (emitted as `<prefix><name>`); `right` must also expose
    * `key` and `ts`. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String,
               payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val pStruct = struct(payload.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val pType = right.select(pStruct.as("__p")).schema("__p").dataType
    val l = left.select(col(key).as("__k"), col(ts).as("__ts"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(pType).as("__p"))
    // ANSI/DuckDB ASOF never matches a NULL key (equality) OR a NULL
    // right timestamp (l.ts >= NULL is never true), but Spark's window
    // machinery groups NULL keys together and sorts NULL timestamps
    // first-in-frame — drop such RIGHT rows so both engines agree
    // (left rows themselves are preserved either way)
    val r = right.filter(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).as("__ts"),
        lit(0).as("__side"), lit(null).cast(lType).as("__l"), pStruct.as("__p"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__l").getField(c).as(c)) ++
        payload.map(p => col("__c").getField(p).as(prefix + p)): _*)
  }

  // ---------------------------------------------------------------- q53
  /** Each click joined to the user's most recent purchase at or before
    * it (amount + when). Purchases collapse to one row per (user, ts)
    * with max(value) so "latest" is well-defined in both engines. */
  def q53AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
    asOfJoin(clicks, purchases, "user_id", "ts",
      payload = Seq("ts", "p_value"), prefix = "last_")
      .orderBy(col("event_id"))
  }

  val q53Sql: String =
    """WITH l AS (SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'click'),
      |r AS (SELECT user_id, ts, max(value) AS p_value FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT l.event_id, l.user_id, l.ts, l.value,
      |  r.ts AS last_ts, r.p_value AS last_p_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Interval aggregation by INTERVAL FLATTENING: per calendar day, how
    * many lineitems are in transit (ship day ≤ d ≤ ship day + transit
    * days) and their total quantity. The naive formulation is a range
    * join (days × intervals on a BETWEEN predicate) — quadratic, and the
    * classic sort-merge-join killer. When interval length is BOUNDED
    * (here ≤ 13 days; true of transit windows, sessions, TTLs), the
    * scale-correct plan is to EXPLODE each interval into its day keys
    * and hash-aggregate on the day — cost O(rows · max_len), one
    * shuffle, no range join anywhere. The same flatten-to-equi-key
    * trick is how q29/q62 turn Hamming-ball joins into band equi-joins.
    *
    * Transit days are derived deterministically from the quantity
    * (qty mod 14) — the testdata has no receipt date column; the
    * derivation is the operator's input contract, not its point. */
  def q76IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    // floor() explicitly before the integral cast: Spark cast(double as
    // int) truncates toward zero while DuckDB ::INT rounds to nearest —
    // identical only while quantities are integral-valued. floor() in
    // BOTH engines makes the intent explicit and parity unconditional.
    val li = Tables.lineitem(spark, dir)
      .select(to_date(col("l_shipdate")).as("d0"),
        floor(col("l_quantity")).cast("int").as("qty"))
      .withColumn("d1", expr("date_add(d0, qty % 14)"))
    li.select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"),
        col("qty"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_in_transit"), sum(col("qty")).as("qty_sum"))
      .orderBy(col("day"))
  }

  val q76Sql: String =
    """WITH iv AS (SELECT date_trunc('day', l_shipdate)::DATE AS d0,
      |    (date_trunc('day', l_shipdate)
      |      + INTERVAL 1 DAY * (floor(l_quantity)::INT % 14))::DATE AS d1,
      |    floor(l_quantity)::INT AS qty
      |  FROM lineitem),
      |ex AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day, qty
      |  FROM iv)
      |SELECT day, count(*) AS n_in_transit, sum(qty)::BIGINT AS qty_sum
      |FROM ex GROUP BY day ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_asof_join"    -> q53AsofJoin _,
    "q76_interval_join" -> q76IntervalJoin _,
  )

  val oracle: Map[String, String] = Map(
    "q53_asof_join"    -> q53Sql,
    "q76_interval_join" -> q76Sql,
  )
}
