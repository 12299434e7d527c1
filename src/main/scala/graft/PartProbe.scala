package graft

import org.apache.spark.sql.functions._

/** One-shot plan probe for the PageRank superstep's edge-side shuffle:
  * prints whether the edge⋈rank join re-exchanges the static edges
  * frame when edgesD is checkpointed (a) as built today and (b) after
  * an explicit repartition(src) — Dataset.localCheckpoint preserves
  * outputPartitioning into the LogicalRDD leaf, so (b) should plan
  * zero edge-side exchanges in EVERY superstep.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PartProbe" */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    for (pre <- Seq("off", "repart", "noaqe")) {
      val s = if (pre == "noaqe") {
        val ns = spark.newSession()
        ns.conf.set("spark.sql.adaptive.enabled", "false")
        ns
      } else spark
      val e = operators.Graph.shipEdgesForSpec(s, sfDir)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val built = e.join(deg, "src")
      val edgesD = (if (pre != "off") built.repartition(col("src")) else built)
        .localCheckpoint(true)
      val nodes = edgesD.select(col("src").as("node")).distinct().localCheckpoint(true)
      val ranks = nodes.select(col("node"), lit(1000000L).as("r")).localCheckpoint(true)
      val step = operators.Graph.pagerankStep(edgesD, ranks, lazyChain = true)
      step.collect()
      val plan = step.queryExecution.executedPlan
      def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val extra = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
          case _ => Seq.empty
        }
        p +: (p.children ++ extra).flatMap(all)
      }
      val exchanges = all(plan).collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      }.distinct
      println(s"PARTPROBE pre=$pre exchanges=${exchanges.size}")
      exchanges.foreach(x => println(s"  PARTPROBE   ${x.outputPartitioning} <- " +
        x.child.getClass.getSimpleName))
      operators.Checkpoints.release(edgesD)
      operators.Checkpoints.release(nodes)
      operators.Checkpoints.release(ranks)
    }
    // full 14-superstep lazy loop, both modes, 2 timed runs each
    for (mode <- Seq("aqe", "noaqe", "hashj", "aqe", "noaqe", "hashj")) {
      val s = if (mode != "aqe") {
        val ns = spark.newSession()
        ns.conf.set("spark.sql.adaptive.enabled", "false")
        if (mode == "hashj")
          ns.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        ns
      } else spark
      val t0 = System.nanoTime()
      val e = operators.Graph.shipEdgesForSpec(s, sfDir)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val built = e.join(deg, "src")
      val edgesD = (if (mode != "aqe") built.repartition(col("src")) else built)
        .localCheckpoint(true)
      val nodes = edgesD.select(col("src").as("node")).distinct().localCheckpoint(true)
      var ranks = nodes.select(col("node"), lit(1000000L).as("r")).localCheckpoint(true)
      var prev = ranks
      for (_ <- 1 to 14) {
        val old = prev
        prev = ranks
        ranks = operators.Graph.pagerankStep(edgesD, ranks, lazyChain = true)
          .select(col("node"), col("r")).localCheckpoint(true)
        if (!(old eq prev)) operators.Checkpoints.release(old)
      }
      val top = ranks.orderBy(col("r").desc, col("node")).limit(20)
        .select(col("node")).collect().map(_.getLong(0)).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PARTPROBE loop mode=$mode total=$dt%6.2f s top3=${top.take(3)}")
      operators.Checkpoints.release(prev)
      operators.Checkpoints.release(ranks)
      operators.Checkpoints.release(edgesD)
      operators.Checkpoints.release(nodes)
      System.gc(); Thread.sleep(1500)
    }
    spark.stop()
  }
}
