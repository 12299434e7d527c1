package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Time-series similarity search over the event stream (pattern source:
  * PAPERS.md, "Time Series Similarity Search for Streaming Data in
  * Distributed Systems", EDBT 2019): each user's activity becomes a dense
  * 30-day count vector, and similar-behavior users are found by cosine
  * top-k over those vectors — the same vector machinery as the embedding
  * queries (graft_dot), fed from event time instead of a model.
  *
  * Scale shape: counts are pre-aggregated per (user, day) FIRST — partial
  * (map-side-combined) counts, state bounded at ≤`days` rows per user —
  * then one groupBy(user) collects the tiny (day, n) pairs and a map-side
  * densify expands them to the dense vector. Aggregation-buffer state is
  * O(days) per user regardless of event volume: a 10⁸-event power user
  * costs the same 30-entry map as anyone else. The kNN reuses the
  * broadcast-queries + window top-k plan from q30.
  */
object TimeSeries {

  private val days = 30
  private val epoch = "2024-01-01"

  /** user_id → dense double vector of daily event counts.
    *
    * Two-stage aggregation: (user, day) counts first — Spark plants a
    * partial HashAggregate before the exchange, so the shuffle carries at
    * most `days` rows per user per input partition — then the per-user
    * collect sees only the ≤`days` (day, n) pairs, never raw events, and
    * the densify reads the tiny map. (The previous collect_list-of-raw-day-
    * indexes form materialized one array element per EVENT in a single
    * aggregation buffer — unbounded per-user state under heavy hitters.) */
  private def userSeries(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit(epoch))).as("d"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("d"), col("n")))).as("dn"))
      .select(col("user_id"),
        transform(sequence(lit(0), lit(days - 1)),
          i => coalesce(element_at(col("dn"), i), lit(0L)).cast("double")).as("v"))
      .select(col("user_id"), col("v"),
        sqrt(call_function("graft_dot", col("v"), col("v"))).as("nrm"))

  /** q48: top-5 behaviorally-similar users for each query user (id < 3). */
  def q48TimeseriesKnn(spark: SparkSession, dir: String): DataFrame = {
    val s = userSeries(spark, dir)
    val q = s.filter(col("user_id") < 3)
      .select(col("user_id").as("q_user"), col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("q_user")).orderBy(col("cos").desc, col("user_id"))
    s.join(broadcast(q), col("user_id") =!= col("q_user"))
      .select(col("q_user"), col("user_id"),
        round(call_function("graft_dot", col("qv"), col("v")) /
          (col("qnrm") * col("nrm")), 6).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy(col("q_user"), col("rk"))
  }

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i] * $b[i])), (x,y) -> x+y)"

  val q48Sql: String =
    s"""WITH raw AS (SELECT user_id,
       |    date_diff('day', DATE '$epoch', ts::DATE)::INT AS d FROM events),
       |u AS (SELECT user_id, list(d) AS ds FROM raw GROUP BY user_id),
       |s AS (SELECT user_id,
       |    list_transform(range(0, $days), i -> len(list_filter(ds, x -> x = i))::DOUBLE) AS v
       |  FROM u),
       |n AS (SELECT user_id, v, sqrt(${dotSql("v", "v")}) AS nrm FROM s),
       |q AS (SELECT user_id AS q_user, v AS qv, nrm AS qnrm FROM n WHERE user_id < 3),
       |sc AS (SELECT q.q_user, n.user_id,
       |    round(${dotSql("q.qv", "n.v")} / (q.qnrm * n.nrm), 6) AS cos
       |  FROM n JOIN q ON n.user_id <> q.q_user),
       |rk AS (SELECT q_user, user_id, cos,
       |    row_number() OVER (PARTITION BY q_user ORDER BY cos DESC, user_id) AS rk
       |  FROM sc)
       |SELECT q_user, user_id, cos, rk FROM rk WHERE rk <= 5
       |ORDER BY q_user, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_timeseries_knn" -> q48TimeseriesKnn _,
  )

  val oracle: Map[String, String] = Map(
    "q48_timeseries_knn" -> q48Sql,
  )
}
