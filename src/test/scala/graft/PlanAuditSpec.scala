package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Suite-wide physical-plan invariant: NO query in `SparkEntry.queries`
  * may execute a cartesian product or a nested-loop join, except the
  * entries allow-listed below with a written justification. The
  * targeted PlanShapeSpec tests pin individual docstring claims; this
  * audit pins the one claim every docstring makes implicitly — at
  * 100 TB an accidental O(N·M) join operator is the difference between
  * a job and an outage, and a refactor that degrades ONE query's join
  * into a nested loop must fail CI, not a production run.
  *
  * The audit executes every query (AQE finalizes plans only on
  * execution) at the smallest corpus — plan SHAPE, not performance, is
  * the assertion, and join strategy selection for these plans is
  * size-threshold-driven only where a broadcast is chosen, which never
  * turns INTO a nested loop at larger corpora: Spark picks
  * BroadcastNestedLoopJoin/CartesianProduct only when the join has no
  * equi-keys, a property of the query, not the data. */
class PlanAuditSpec extends SparkSpec {

  // traversal shared with PlanShapeSpec (PlanWalk): AQE wrapper +
  // subquery descent, so a nested loop inside a scalar-subquery plan
  // cannot pass the audit unseen
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = PlanWalk.allNodes(p)

  /** The 15 queries that legitimately plan a nested-loop join, each
    * with the reason the shape stays bounded (never corpus × corpus).
    * Two families:
    *  - **1-row computed-scalar cross joins** (the dominant family):
    *    a corpus-level aggregate (total, avgdl, bounds, distribution,
    *    sketch estimate) has no join key, so attaching it plans as a
    *    BroadcastNestedLoopJoin of a 1-row broadcast side — constant
    *    work per probe row at any corpus size.
    *  - **Bounded-domain non-equi joins**: exact-kNN ground truth
    *    (q30/q93; q102 materializes q30's output before joining) broadcasts the
    *    ≤10-query audit set against the corpus — linear in the corpus
    *    by construction, and the thing the ANN operators exist to
    *    avoid; q36/q48 join domain-bounded spines (hours × region
    *    catalog, queries × windowed series).
    * Notably NOT here: every dedup pair stage, the skyline dominance
    * join, the quantizer budget joins — all plan pure equi-joins
    * (q108/q112's pinned by PlanShapeSpec on both kernels).
    * An entry here is a claim that the non-equi side is CONSTANT or
    * DOMAIN-BOUNDED — never data × data. The exact-set-match assert
    * below means adding a nested loop anywhere else, or cleaning one
    * up without deleting its entry, both fail this test. */
  private val allowNestedLoop: Map[String, String] = Map(
    "q30_knn_bruteforce" -> "exact ground truth: broadcast <=10 queries x corpus",
    "q36_stall_detect" -> "hour spine x broadcast region catalog, both domain-bounded",
    "q48_timeseries_knn" -> "query x windowed-series, both domain-bounded",
    "q65_bm25" -> "1-row corpus avgdl/N frame cross join",
    "q78_perplexity" -> "1-row corpus-total frame cross join",
    "q82_rolling_distinct" -> "1-row window-bounds frame cross join",
    "q84_quality_audit" -> "1-row corpus-stats frames (two) cross join",
    "q91_sketch_merge" -> "sketch-estimate 1-row frames cross join",
    "q93_hard_negatives" -> "broadcast query set x corpus, q30's shape",
    "q95_bigram_lm" -> "1-row corpus-total frame cross join",
    "q96_source_divergence" -> "1-row corpus-distribution frame cross join",
    "q98_join_card_estimate" -> "sketch x sketch 1-row summaries",
    // q102 is deliberately absent since r20: its q30 ground truth is
    // materialized eagerly (localCheckpoint — one brute-force pass
    // instead of one per index leg), so the returned plan joins a
    // 30-row LogicalRDD and no nested loop survives to the audit
    "q104_heavy_hitters" -> "1-row token-count frame cross join",
    // q125 is deliberately absent: its exact quantiles enter as
    // literals (Sketches.exactQuantilesDistributed), so the face is
    // the sketch aggregation's own 1-row plan — no join at all
    // q114/q122 are deliberately absent: their corpus totals are a
    // window sum over the k-row spine frame (round 11) — the former
    // 1-row totals cross join re-planned the occupancy subtrees twice,
    // which doubled q122's delta scan
  )

  test("no query plans a cartesian product or nested-loop join off the allow-list") {
    val tripped = scala.collection.mutable.Map[String, Seq[String]]()
    val names = SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE; shape is the assertion, corpus is tiny
      val bad = allNodes(df.queryExecution.executedPlan).collect {
        case n: org.apache.spark.sql.execution.joins.CartesianProductExec => n.nodeName
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n.nodeName
      }
      if (bad.nonEmpty) tripped(name) = bad
    }
    val violations = tripped.toMap -- allowNestedLoop.keySet
    assert(violations.isEmpty,
      s"unjustified nested-loop/cartesian plans: ${violations.toSeq.sortBy(_._1)
        .map { case (n, ops) => s"$n -> ${ops.mkString("+")}" }.mkString("; ")}")
    // the allow-list must not rot EITHER WAY: an entry whose query no
    // longer plans a nested loop is a stale justification (the query
    // improved or was renamed) and must be removed — exact set match
    // keeps every justification live
    val stale = allowNestedLoop.keySet -- tripped.keySet
    assert(stale.isEmpty, s"stale allow-list entries (no nested loop planned): $stale")
  }
}
