package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Misra–Gries heavy hitters as a MERGEABLE typed `Aggregator` — the
  * frequent-items sketch Spark has no built-in for (approx_count_distinct
  * covers cardinality, approx_percentile covers quantiles; nothing covers
  * "which keys are frequent" in bounded memory).
  *
  * The sketch keeps at most `k` counters. Stream update is classic
  * Misra–Gries (increment a held counter, claim a free slot, else decrement
  * everything); partial-state MERGE follows Agarwal et al., "Mergeable
  * Summaries" (PODS'12): add counts, then subtract the (k+1)-th largest
  * value and drop non-positives — which preserves the error bound
  * ADDITIVELY across an arbitrary merge tree. That mergeability is the
  * whole point at 100 TB: each partition sketches independently
  * (constant memory, one pass), partials merge like any algebraic
  * aggregate, and the guarantee survives:
  *
  *   exact(t) − N/(k+1)  ≤  est(t)  ≤  exact(t)          for every term t
  *   every t with exact(t) > N/(k+1) is IN the sketch     (no false negatives)
  *
  * The candidate SET and estimates depend on partition/merge order, so
  * they are intentionally not part of the oracle-gated output. What IS
  * deterministic is the guarantee itself: q104 emits a one-row audit that
  * recomputes exact counts next to the sketch and PROVES the bounds held
  * on this corpus and partitioning — the oracle pins the audit's exact
  * values (token count, threshold) and its invariant flags (all 1 by the
  * theorem; any implementation bug flips them and fails the gate).
  * HeavyHittersSpec additionally drives a skewed synthetic stream through
  * forced repartitions and checks the bounds and no-false-negative
  * property directly.
  */
object HeavyHitters {

  private[graft] val k = 8

  case class MGBuf(counts: Map[String, Long], processed: Long)

  object MGAgg extends Aggregator[String, MGBuf, Map[String, Long]] {
    override def zero: MGBuf = MGBuf(Map.empty, 0L)

    override def reduce(b: MGBuf, term: String): MGBuf = {
      val c = b.counts
      val next =
        if (c.contains(term)) c.updated(term, c(term) + 1L)
        else if (c.size < k) c.updated(term, 1L)
        else c.collect { case (t, n) if n > 1L => t -> (n - 1L) }
      MGBuf(next, b.processed + 1L)
    }

    /** Agarwal et al. merge: pointwise sum, then subtract the (k+1)-th
      * largest count from every entry and drop non-positives. */
    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val summed = (a.counts.keySet ++ b.counts.keySet).iterator.map { t =>
        t -> (a.counts.getOrElse(t, 0L) + b.counts.getOrElse(t, 0L))
      }.toMap
      val pruned =
        if (summed.size <= k) summed
        else {
          val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          summed.collect { case (t, n) if n > cut => t -> (n - cut) }
        }
      MGBuf(pruned, a.processed + b.processed)
    }

    override def finish(b: MGBuf): Map[String, Long] = b.counts
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  // --------------------------------------------------------------- q104
  /** One-row heavy-hitter audit over the document token stream: the MG
    * sketch (k=8 counters, one pass, mergeable partials) next to the
    * exact frequency table, reduced to the sketch's deterministic face —
    * token count, the N/(k+1) guarantee threshold, and the theorem's
    * invariants checked on this very run (1 = held):
    * no-false-negatives, est ≤ exact, error ≤ threshold, ≤ k candidates.
    *
    * Scale shape: the sketch side is a constant-memory single pass
    * (partial MG per partition, one log-depth merge tree — the same
    * two-phase plan as any algebraic aggregate); the exact side is the
    * audit's cost and exists only to prove the bounds — a production
    * 100 TB run ships the sketch alone. */
  def q104HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val mg = udaf(MGAgg)
    val terms = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
    val cand = terms.agg(mg(col("term")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("term", "est")))
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("exact"))
    val thr = floor(col("n_tokens") / (k + 1)).cast("long")
    exact.join(cand, Seq("term"), "left")
      .crossJoin(broadcast(terms.agg(count(lit(1)).as("n_tokens"))))
      .agg(
        min(col("n_tokens")).as("n_tokens"),
        min(thr).as("threshold"),
        min(when(col("exact") > thr,
          when(col("est").isNotNull, lit(1)).otherwise(lit(0))).otherwise(lit(1)))
          .cast("int").as("all_frequent_found"),
        min(when(col("est").isNotNull,
          when(col("est") <= col("exact"), lit(1)).otherwise(lit(0))).otherwise(lit(1)))
          .cast("int").as("est_le_exact"),
        min(when(col("est").isNotNull,
          when(col("exact") - col("est") <= thr, lit(1)).otherwise(lit(0))).otherwise(lit(1)))
          .cast("int").as("err_bounded"),
        when(sum(when(col("est").isNotNull, lit(1)).otherwise(lit(0))) <= k, lit(1))
          .otherwise(lit(0)).cast("int").as("candidates_bounded"))
      .select(col("n_tokens"), lit(k).cast("int").as("k"), col("threshold"),
        col("all_frequent_found"), col("est_le_exact"), col("err_bounded"),
        col("candidates_bounded"))
  }

  val q104Sql: String =
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
       |g AS (SELECT count(*) AS n_tokens FROM t)
       |SELECT n_tokens, $k::INT AS k, (n_tokens // ${k + 1})::BIGINT AS threshold,
       |  1::INT AS all_frequent_found, 1::INT AS est_le_exact,
       |  1::INT AS err_bounded, 1::INT AS candidates_bounded
       |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_heavy_hitters" -> q104HeavyHitters _,
  )

  val oracle: Map[String, String] = Map(
    "q104_heavy_hitters" -> q104Sql,
  )
}
