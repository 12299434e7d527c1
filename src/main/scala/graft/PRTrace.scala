package graft

import org.apache.spark.sql.functions._

/** Per-superstep diagnostic for the q109 lazy PageRank loop — prints
  * wall-clock and live persistent-RDD count per superstep across
  * several back-to-back runs, the instrument that separates "one slow
  * superstep" from "uniformly degraded run" and verifies the eager
  * checkpoint-release discipline actually bounds live block state.
  * This is the tool that found BOTH round-8 loop results: the
  * shuffle-file accumulation mode (rdds pinned at 5 while runs degrade
  * uniformly → the surviving state is shuffle files, not blocks) and,
  * via its PartProbe sibling, the AQE-discards-checkpoint-partitioning
  * 4×-exchange tax. Default traces the SHIPPED loop shape
  * (loopSession + partitioned edgesDegreed); arg 2 = "legacy" traces
  * the pre-fix AQE shape, "gc" adds a full GC between runs (the
  * ContextCleaner A/B switch).
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.PRTrace 4 [legacy|gc]"
  */
object PRTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val legacy = args.lift(1).contains("legacy")
    val gcBetween = args.lift(1).contains("gc")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to runs) {
      val t0 = System.nanoTime()
      val edgesD =
        if (legacy) {
          val e = operators.Graph.shipEdgesForSpec(spark, sfDir)
          val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
          e.join(deg, "src").localCheckpoint(true)
        } else operators.Graph.shipEdgesDegreedForSpec(spark, sfDir)
      val nodes = edgesD.select(col("src").as("node")).distinct().localCheckpoint(true)
      val tSetup = (System.nanoTime() - t0) / 1e9
      var ranks = nodes.select(col("node"), lit(1000000L).as("r")).localCheckpoint(true)
      var prev = ranks
      val steps = (1 to 14).map { i =>
        val t1 = System.nanoTime()
        val old = prev
        prev = ranks
        ranks = operators.Graph.pagerankStep(edgesD, ranks, lazyChain = true)
          .select(col("node"), col("r")).localCheckpoint(true)
        if (!(old eq prev)) operators.Checkpoints.release(old)
        val dt = (System.nanoTime() - t1) / 1e9
        f"$dt%5.2f"
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"PRTRACE run=$r setup=$tSetup%5.2f steps=[${steps.mkString(" ")}] " +
        f"total=$total%6.2f s rdds=${spark.sparkContext.getPersistentRDDs.size}")
      operators.Checkpoints.release(prev)
      operators.Checkpoints.release(ranks)
      if (legacy) operators.Checkpoints.release(edgesD) // shared cache otherwise
      operators.Checkpoints.release(nodes)
      if (gcBetween) { System.gc(); Thread.sleep(2000) }
    }
    spark.stop()
  }
}
