package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-time windowing surface — the reference's monitor loop
  * (`/root/reference/regionSpout.go:102-117`: 30 s tumbling per-region
  * counts + zero-count stall detection) as first-class batch queries, plus
  * the sliding/session variants the reference lacks (SURVEY §2.1). The
  * same `window()`/`session_window()` expressions run unchanged under
  * Structured Streaming (graft.streaming.Monitor); batch forms exist so
  * the DuckDB oracle can gate them.
  *
  * Scale shape: window aggregation is a partial-agg-then-exchange on
  * (window, key) — the canonical streaming-agg layout; the stall grid is
  * generated from bounds (2-row aggregate) cross-joined with the tiny
  * region catalog, never from the fact table.
  */
object Windows {

  // ---------------------------------------------------------------- q33
  /** 30 s tumbling counts per event type — regionSpout.go:103's period. */
  def q33TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "30 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("w_start"), col("event_type"))

  val q33Sql: String =
    """SELECT time_bucket(INTERVAL '30 seconds', ts) AS w_start, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Sliding 60 s window, 30 s slide: each event lands in two windows.
    * Oracle mirrors Spark's window expansion: starts at the two slide
    * boundaries covering the event. */
  def q34SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "60 seconds", "30 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))

  val q34Sql: String =
    """WITH expanded AS (
      |  SELECT event_type,
      |    unnest([time_bucket(INTERVAL '30 seconds', ts),
      |            time_bucket(INTERVAL '30 seconds', ts) - INTERVAL '30 seconds']) AS w_start
      |  FROM events)
      |SELECT w_start, event_type, count(*) AS n
      |FROM expanded
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Session windows per user, 8 h inactivity gap. Spark's session_window
    * end = last event + gap; the oracle's gaps-and-islands form computes
    * the same bounds. */
  def q35SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "8 hours"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  val q35Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL '8 hours' THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL '8 hours' AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Stall detection (O9, regionSpout.go:113-115): full hour × region grid
    * (generated from bounds, not the fact table) left-joined against
    * per-region hourly counts; zero or missing → stalled. */
  def q36StallDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val counts = Geo.assignRegion(spark, e)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("region"))
      .agg(count(lit(1)).as("n"))
    val hours = e
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val regionIds = (Geo.usaCatalog.map(_.id) :+ "NONE").toDF("region")
    hours.crossJoin(broadcast(regionIds))
      .join(counts, Seq("h", "region"), "left")
      .select(col("h").as("w_start"), col("region"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        (col("n").isNull || col("n") === 0L).as("stalled"))
      .orderBy(col("w_start"), col("region"))
  }

  val q36Sql: String =
    s"""WITH pts AS (${Geo.pointSql}),
       |a AS (SELECT p.event_id, p.ts, coalesce(min(r.id), 'NONE') AS region
       |      FROM pts p LEFT JOIN ${Geo.regionSql("r")}
       |        ON p.lon >= least(r.east, r.west) AND p.lon <= greatest(r.east, r.west)
       |       AND p.lat >= r.south AND p.lat <= r.north
       |      GROUP BY p.event_id, p.ts),
       |counts AS (SELECT date_trunc('hour', ts) AS h, region, count(*) AS n
       |  FROM a GROUP BY 1, 2),
       |bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
       |    date_trunc('hour', max(ts)) AS h1 FROM events),
       |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h FROM bounds),
       |regions2 AS (SELECT unnest(['USA0','USA1','NONE']) AS region),
       |grid AS (SELECT h, region FROM hours CROSS JOIN regions2)
       |SELECT g.h AS w_start, g.region AS region,
       |  coalesce(c.n, 0)::BIGINT AS n_events,
       |  (c.n IS NULL OR c.n = 0) AS stalled
       |FROM grid g LEFT JOIN counts c ON g.h = c.h AND g.region = c.region
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Statistical anomaly detection over the window counts: hourly
    * per-type volumes more than 2σ from that type's mean — the
    * quantitative upgrade of q36's zero-count stall gauge (a stall is
    * just the extreme case; this also catches surges and partial
    * outages). Two tiny aggregates over the window frame (itself one
    * partial+final pass over events) and a broadcast join of the
    * per-type stats — nothing here grows with corpus size except the
    * first windowing pass.
    *
    * Determinism: mean and variance come from exact integer sums
    * (Σn as long; Σn² in decimal(38,0) ≙ DuckDB HUGEINT, wide enough
    * that ~3·10⁹-per-window counts can't wrap a 64-bit square), so the
    * derived doubles are single correctly-rounded divisions —
    * bit-identical in DuckDB; z is rounded with the boundary nudge. */
  def q66WindowOutliers(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val mean = col("s1").cast("double") / col("nw")
    // s2 = Σn² accumulates in decimal(38,0), not long: an hourly count
    // near 3·10⁹ makes n² ≈ 10¹⁹ > Long.MAX, which would silently wrap
    // (or throw under ANSI). DuckDB's sum(BIGINT) is HUGEINT-width
    // natively, so decimal keeps the two engines' exact-integer claim in
    // lockstep; the derived doubles stay single correctly-rounded casts.
    val stats = w.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nw"), sum(col("n")).as("s1"),
        sum(col("n").cast("decimal(19,0)") * col("n")).as("s2"))
      .select(col("event_type"), mean.as("mean"),
        sqrt(col("s2").cast("double") / col("nw") - mean * mean).as("sd"))
    w.join(broadcast(stats), "event_type")
      .filter(col("sd") > 0 && abs(col("n") - col("mean")) > col("sd") * 2)
      .select(col("event_type"), col("w_start"), col("n"),
        round(col("mean") + 1e-9, 4).as("mean_n"),
        round((col("n") - col("mean")) / col("sd") + 1e-9, 4).as("z"))
      .orderBy(col("event_type"), col("w_start"))
  }

  val q66Sql: String =
    """WITH w AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, count(*) AS nw,
      |    sum(n)::BIGINT AS s1, sum(n::HUGEINT * n) AS s2
      |  FROM w GROUP BY 1),
      |j AS (SELECT w.event_type, w.w_start, w.n,
      |    s1::DOUBLE / nw AS mean,
      |    sqrt(s2::DOUBLE / nw - (s1::DOUBLE / nw) * (s1::DOUBLE / nw)) AS sd
      |  FROM w JOIN st USING (event_type))
      |SELECT event_type, w_start, n,
      |  round(mean + 1e-9, 4) AS mean_n,
      |  round((n - mean) / sd + 1e-9, 4) AS z
      |FROM j
      |WHERE sd > 0 AND abs(n - mean) > sd * 2
      |ORDER BY event_type, w_start""".stripMargin

  // ---------------------------------------------------------------- q80
  /** Ordered-funnel analysis: per user, the first signup, the first
    * click strictly AFTER that signup, and the first purchase strictly
    * after that click — the product-analytics "did they complete the
    * sequence, and when" query, with q69's cohort matrix as its
    * aggregate sibling.
    *
    * The tempting formulation — collect every event per user and walk
    * the sorted array — is the unbounded-state trap the round-1 verdict
    * flagged in TimeSeries: a power user's full event history in one
    * aggregation buffer. This form never materializes a history:
    * each funnel step is ONE bounded aggregation (min ts per user,
    * state = one timestamp) joined to the next step's filtered scan on
    * the user key. Step frames are user-cardinality-sized (tiny next to
    * the event log), so at 100 TB each join is a broadcast or a
    * co-partitioned hash join on user_id, and nothing grows with
    * events-per-user. */
  def q80Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    // no broadcast hints: the step frames are user-cardinality-sized and
    // unbounded — AQE broadcasts them while they're small and falls back
    // to a co-partitioned hash join on user_id when they aren't (a forced
    // hint would foreclose exactly that fallback at 100 TB)
    val c = ev.filter(col("event_type") === "click")
      .join(s, "user_id")
      .filter(col("ts") > col("signup_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    s.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("click_ts"), col("purchase_ts"),
        when(col("purchase_ts").isNotNull, 3)
          .when(col("click_ts").isNotNull, 2)
          .otherwise(1).as("steps"))
      .orderBy(col("user_id"))
  }

  val q80Sql: String =
    """WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS click_ts
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s.signup_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
      |SELECT s.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
      |  CASE WHEN p.purchase_ts IS NOT NULL THEN 3
      |       WHEN c.click_ts IS NOT NULL THEN 2 ELSE 1 END AS steps
      |FROM s LEFT JOIN c ON s.user_id = c.user_id
      |LEFT JOIN p ON s.user_id = p.user_id
      |ORDER BY s.user_id""".stripMargin

  // ---------------------------------------------------------------- q82
  /** Rolling 7-day distinct users per day (the WAU curve) — the
    * sliding-window COUNT DISTINCT that naive SQL writes as a
    * self-join (`days × events ON ts BETWEEN d-6 AND d`: quadratic,
    * and distinct-inside-range resists partial aggregation). The
    * scale-correct plan reuses q76's flatten-to-equi-key move on the
    * DEDUPLICATED (day, user) pairs: each active day covers the 7
    * report days it can influence, so explode to (report_day, user) and
    * count distinct per day — cost O(active_pairs · 7), one dedup
    * shuffle + one distinct aggregate, no range join. Days are clipped
    * to the observed range so leading/trailing partial windows don't
    * fabricate report days. */
  def q82RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val du = ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    // bounds from the deduped relation, not a second events scan:
    // to_date is monotone, so min/max of d over du equals min/max of
    // to_date(ts) over events, and the dedup exchange gets reused
    val bounds = du.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    du.select(explode(expr("sequence(d, date_add(d, 6), interval 1 day)")).as("day"),
        col("user_id"))
      .crossJoin(broadcast(bounds))
      .filter(col("day").between(col("d0"), col("d1")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy(col("day"))
  }

  val q82Sql: String =
    """WITH du AS (SELECT DISTINCT date_trunc('day', ts)::DATE AS d, user_id FROM events),
      |cov AS (SELECT unnest(generate_series(d, d + 6, INTERVAL 1 DAY))::DATE AS day,
      |    user_id FROM du),
      |bounds AS (SELECT min(date_trunc('day', ts))::DATE AS d0,
      |    max(date_trunc('day', ts))::DATE AS d1 FROM events)
      |SELECT day, count(DISTINCT user_id) AS wau
      |FROM cov, bounds WHERE day BETWEEN d0 AND d1
      |GROUP BY day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q83
  /** First-order Markov transition matrix of user behavior: for every
    * (event_type → next event_type) step inside a user's timeline, the
    * step count and the conditional probability P(next | current). The
    * per-user ordering comes from ONE window shuffle keyed by user
    * (ties broken by event_id so the sequence is total and
    * deterministic); the matrix itself is a 25-row aggregate. The
    * conditional probabilities are single divisions of exact longs —
    * bit-identical cross-engine, nudged rounding at the boundary.
    * Scale: sequence analytics is a per-key sort — the shuffle is by
    * user_id (AQE handles skewed users), state per row is one lead()
    * value, never a collected history. */
  def q83EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("src"))
    steps
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(bySrc) + 1e-9, 6))
      .orderBy(col("src"), col("dst"))
  }

  val q83Sql: String =
    """WITH seq AS (SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |  FROM events)
      |SELECT event_type AS src, nxt AS dst, count(*) AS n,
      |  round(count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY event_type) + 1e-9, 6) AS p
      |FROM seq WHERE nxt IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_tumbling_window" -> q33TumblingWindow _,
    "q34_sliding_window"  -> q34SlidingWindow _,
    "q35_session_window"  -> q35SessionWindow _,
    "q36_stall_detect"    -> q36StallDetect _,
    "q66_window_outliers" -> q66WindowOutliers _,
    "q80_funnel"          -> q80Funnel _,
    "q82_rolling_distinct" -> q82RollingDistinct _,
    "q83_event_transitions" -> q83EventTransitions _,
  )

  val oracle: Map[String, String] = Map(
    "q33_tumbling_window" -> q33Sql,
    "q34_sliding_window"  -> q34Sql,
    "q35_session_window"  -> q35Sql,
    "q36_stall_detect"    -> q36Sql,
    "q66_window_outliers" -> q66Sql,
    "q80_funnel"          -> q80Sql,
    "q82_rolling_distinct" -> q82Sql,
    "q83_event_transitions" -> q83Sql,
  )
}
