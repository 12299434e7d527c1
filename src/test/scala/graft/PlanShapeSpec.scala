package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec

/** Physical-plan shape assertions for the round-3 operators — the scale
  * claims in their docstrings (map-side, broadcast-only, top-k pushed
  * below the exchange), checked against the executed plan rather than
  * trusted. */
class PlanShapeSpec extends SparkSpec {

  private def executed(df: DataFrame): SparkPlan = {
    // collect(), not count(): count() lets Catalyst prune the very
    // projections these tests make claims about; collect() drives the
    // honest full-output plan and finalizes AQE
    df.collect()
    df.queryExecution.executedPlan
  }

  /** Every node in the finalized plan. TreeNode.collect does NOT descend
    * into AQE wrappers (QueryStageExec.plan and
    * AdaptiveSparkPlanExec.executedPlan are fields, not children), so a
    * naive collect sees only stage boundaries — and absence assertions
    * would pass vacuously. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra).flatMap(allNodes)
  }
  private def shuffles(p: SparkPlan) =
    allNodes(p).collect { case s: ShuffleExchangeLike => s }.distinct

  test("q61 quantization is map-side: only the output sort exchanges") {
    val p = executed(graft.operators.Similarity.queries("q61_quantize_embeddings")(spark, sf))
    assert(shuffles(p).size <= 1,
      s"expected at most the ORDER BY exchange, got ${shuffles(p).size}")
  }

  test("q62 joins are all broadcast — the corpus index never shuffles") {
    val p = executed(graft.operators.Dedup.queries("q62_incremental_dedup")(spark, sf))
    val bhj = allNodes(p).collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 2, s"band join + decision join must broadcast, got ${bhj.size}")
    // remaining exchanges: match aggregate + final sort only
    assert(shuffles(p).size <= 3,
      s"no fact-side join shuffles expected, got ${shuffles(p).size}")
  }

  test("q63 pushes the per-group top-k below the exchange") {
    val p = executed(graft.operators.TrainingData.queries("q63_group_sample")(spark, sf))
    val limits = allNodes(p).collect { case w: WindowGroupLimitExec => w }
    assert(limits.size == 2,
      s"expected partial + final WindowGroupLimit, got ${limits.size}")
  }

  test("q60 has no join operator: leakage comes from one gram aggregate") {
    val p = executed(graft.operators.TrainingData.queries("q60_decontaminate")(spark, sf))
    val joins = allNodes(p).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"expected a join-free plan, got ${joins.map(_.nodeName)}")
  }
}
