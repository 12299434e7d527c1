package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe for the r8 ask: does the AQE + localCheckpoint
  * shuffle tax PartProbe measured on PageRank (4 exchanges/superstep,
  * 2.7× at 10×) also bite the OTHER iterative loops — q56 connected
  * components, q81 BFS, and the Lloyd trainer behind
  * q90/q108/q112/q113/q114?
  *
  * For each loop: count the distinct shuffle exchanges in one round's
  * executed plan under (a) the parent AQE session over plain
  * checkpointed inputs — the pre-r10 shipped form — and (b) the
  * Loops.session child (AQE off, shuffled-hash preferred) over
  * join-key-partitioned inputs — the r10 shipped form; then time the
  * full loop both ways. Lloyd is the control: its round is scan →
  * map-side argmin → one partial+final aggregate with NO join, so both
  * modes should plan the same single exchange — evidence that the fix
  * belongs only where a static frame is re-joined every round.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.LoopProbe"
  */
object LoopProbe {

  /** Distinct shuffle exchanges in the EXECUTED plan, labeled by their
    * child operator — so the probe output shows WHICH side of a join
    * re-exchanges (the corpus-sized edge scan vs the loop-sized
    * frontier), not just how many. Counted on never-persisted frames:
    * a persisted frame's executed plan is replaced by an
    * InMemoryTableScan and hides its build-side exchanges. */
  private def exchangeLabels(df: DataFrame): Seq[String] = {
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val extra = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(all)
    }
    all(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }.distinct.map(s => s"${s.outputPartitioning.toString.takeWhile(_ != '(')}<-${s.child.nodeName}")
  }
  private def exchanges(df: DataFrame): Int = exchangeLabels(df).size

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    val loop = operators.Loops.session(spark)

    // ------------------------------------------------------ q56 CC loop
    // real collision subgraph; one min-label propagation round per mode
    val (nodes0, edges0) = operators.Dedup.collisionGraph(spark, sfDir)
    val und0 = edges0.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(edges0.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .localCheckpoint(true)
    val labels0 = nodes0.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint(true)
    def ccRound(und: DataFrame, labels: DataFrame): DataFrame = {
      val neighborMin = und.join(labels, und("a") === labels("doc_id"))
        .select(col("b").as("doc_id"), col("label"))
        .groupBy(col("doc_id")).agg(min(col("label")).as("nlabel"))
      labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
    }
    // *_nb modes disable auto-broadcast: at sf0.01 the collision
    // subgraph broadcasts and BOTH modes plan zero exchanges — the tax
    // only exists once the label frame outgrows the broadcast
    // threshold, which is exactly the 100 TB regime the loop session is
    // for. nb emulates that regime at probe scale.
    def nbSession(aqe: Boolean): SparkSession = {
      val ns = spark.newSession()
      ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      if (!aqe) {
        ns.conf.set("spark.sql.adaptive.enabled", "false")
        ns.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      }
      ns
    }
    for (mode <- Seq("aqe", "loop", "aqe_nb", "loop_nb")) {
      val s = mode match {
        case "aqe" => spark
        case "loop" => loop
        case nb => nbSession(aqe = nb == "aqe_nb")
      }
      val (und, labels) =
        if (mode.startsWith("aqe")) (operators.Loops.rehost(und0, s).localCheckpoint(true),
          operators.Loops.rehost(labels0, s).localCheckpoint(true))
        else (operators.Loops.rehost(und0, s).repartition(col("a"))
          .sortWithinPartitions("a").localCheckpoint(true),
          operators.Loops.rehost(labels0, s).repartition(col("doc_id"))
            .sortWithinPartitions("doc_id").localCheckpoint(true))
      val r1 = ccRound(und, labels)
      r1.collect() // executed un-persisted: the honest round-1 plan
      val n1 = exchanges(r1)
      // steady-state round: labels side is the previous round's frame —
      // persisted in the pre-r10 aqe form (whose self-join cache-miss
      // re-derives round 1 inline, visible with LOOPPROBE_DUMP), a
      // checkpoint LEAF in the shipped loop form
      val r1m = if (mode.startsWith("aqe")) { r1.persist().count(); r1 }
      else r1.localCheckpoint(true)
      val r2 = ccRound(und, r1m.select(col("doc_id"), col("label")))
      r2.collect()
      println(s"LOOPPROBE cc mode=$mode round1_exchanges=$n1 " +
        s"round2_exchanges=${exchanges(r2)} round2=[${exchangeLabels(r2).mkString(", ")}]")
      if (sys.env.contains("LOOPPROBE_DUMP") && (mode == "aqe" || mode == "loop"))
        println(r2.queryExecution.executedPlan.toString)
      if (mode.startsWith("aqe")) r1m.unpersist() else operators.Checkpoints.release(r1m)
      operators.Checkpoints.release(und); operators.Checkpoints.release(labels)
    }
    edges0.unpersist()
    // full q56 timing, 3 runs (shipped = loop-session form)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      operators.Dedup.q56DedupClusters(spark, sfDir).collect()
      println(f"LOOPPROBE cc q56_shipped run=$i total=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    // ------------------------------------------------------ q81 BFS loop
    for (mode <- Seq("aqe", "loop", "aqe_nb", "loop_nb")) {
      val s = mode match {
        case "aqe" => spark
        case "loop" => loop
        case nb => nbSession(aqe = nb == "aqe_nb")
      }
      val e =
        if (mode.startsWith("aqe")) operators.Loops.rehost(
          operators.Graph.shipEdgesForSpec(spark, sfDir), s).localCheckpoint(true)
        else operators.Loops.rehost(
          operators.Graph.shipEdgesForSpec(spark, sfDir), s)
          .repartition(col("src")).sortWithinPartitions("src").localCheckpoint(true)
      import s.implicits._
      val f0 = Seq(2L, 4L, 6L).map(x => (x, x)).toDF("seed", "node")
        .localCheckpoint(true)
      val next = f0.join(e, f0("node") === e("src"))
        .select(col("seed"), col("dst").as("node")).distinct()
      val fresh = next.join(f0, Seq("seed", "node"), "left_anti")
      fresh.collect()
      println(s"LOOPPROBE bfs mode=$mode superstep_exchanges=${exchanges(fresh)} " +
        s"[${exchangeLabels(fresh).mkString(", ")}]")
      val t0 = System.nanoTime()
      val lv = operators.Graph.bfsLevels(s, e, Seq(2L, 4L, 6L), 3)
        .groupBy(col("depth")).agg(count(lit(1))).collect()
      println(f"LOOPPROBE bfs mode=$mode hops3_total=${(System.nanoTime() - t0) / 1e9}%6.2f s levels=${lv.length}")
      operators.Checkpoints.release(f0)
      operators.Checkpoints.release(e)
    }

    // ---------------------------------------------------- Lloyd (control)
    for (mode <- Seq("aqe", "loop")) {
      val s = if (mode == "aqe") spark else loop
      val (eq, agg) = operators.Similarity.lloydRoundForProbe(s, sfDir)
      agg.collect()
      println(s"LOOPPROBE lloyd mode=$mode round_exchanges=${exchanges(agg)}")
      val dt = operators.Similarity.lloydTrainTimed(eq)
      println(f"LOOPPROBE lloyd mode=$mode train3_total=$dt%6.2f s")
      operators.Checkpoints.release(eq)
    }

    spark.stop()
  }
}
