package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Shared physical-plan traversal for the plan specs — ONE
  * implementation of the wrapper-descent logic, because a Spark
  * upgrade that adds a new wrapper node must be fixed in one place or
  * the copy that wasn't fixed reverts to vacuous absence assertions. */
object PlanWalk {

  /** Execute and return the finalized plan. collect(), not count():
    * count() lets Catalyst prune the very projections plan tests make
    * claims about; collect() drives the honest full-output plan and
    * finalizes AQE. */
  def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan
  }

  /** Every node in the finalized plan. TreeNode.collect does NOT
    * descend into AQE wrappers (QueryStageExec.plan and
    * AdaptiveSparkPlanExec.executedPlan are fields, not children) and
    * never visits SUBQUERY plans — so a naive collect sees only stage
    * boundaries and an absence assertion (no cartesian, no nested
    * loop) would pass vacuously for a join hidden inside a scalar
    * subquery. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra ++ p.subqueries).flatMap(allNodes)
  }

  def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] =
    allNodes(p).collect { case s: ShuffleExchangeLike => s }.distinct
}
