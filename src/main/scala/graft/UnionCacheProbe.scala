package graft

import org.apache.spark.sql.functions._

/** One-shot probe (round 10): q56's collisionGraph persists the
  * verified-pair frame and then references it TWICE in one plan (the
  * undirected self-union) and once more for the node list. The CC
  * probe showed self-JOIN attribute disambiguation can miss the cache
  * of a persisted frame and re-derive its whole producer pipeline
  * inline — does the self-UNION pay the same tax? Counts
  * InMemoryTableScan vs raw-scan leaves in the executed plans.
  *
  * ANSWER (measured, sf0.01): no — both union branches and both
  * node-list references plan InMemoryTableScan (2 memory scans, 0 file
  * scans each). Union needs no attribute disambiguation, so cache
  * matching survives; the re-derivation hazard is SPECIFIC to
  * self-joins over persisted frames (fixed in connectedComponents by
  * per-round checkpoints). collisionGraph's persist is working as
  * intended.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.UnionCacheProbe" */
object UnionCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    val (nodes, edges) = operators.Dedup.collisionGraph(spark, sfDir)
    edges.count() // materialize the cache
    def scanCounts(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      df.collect()
      def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val extra = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
          case _ => Seq.empty
        }
        p +: (p.children ++ extra).flatMap(all)
      }
      val nodes = all(df.queryExecution.executedPlan)
      val mem = nodes.count(_.getClass.getSimpleName.startsWith("InMemoryTableScan"))
      val files = nodes.count(_.getClass.getSimpleName.contains("FileSourceScan"))
      println(s"UNIONPROBE $label inMemoryScans=$mem fileScans=$files")
    }
    scanCounts(edges.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(edges.select(col("doc_b").as("a"), col("doc_a").as("b"))), "self-union")
    scanCounts(nodes, "node-distinct-union")
    edges.unpersist()
    spark.stop()
  }
}
