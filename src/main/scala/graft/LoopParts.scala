package graft

import org.apache.spark.sql.functions._

/** Round-10 probe: the loop session runs AQE-off, so it gave up AQE's
  * partition coalescing — every superstep of the q109 lazy chain runs
  * 32-task stages over a graph whose sf0.1 slice would coalesce to a
  * handful of partitions at runtime. This probe re-runs the 14-superstep
  * lazy loop with the child session's shuffle parallelism (and the
  * static frames' partition count) set to N ∈ {32, 16, 8, 4}, measuring
  * whether per-stage fixed overhead — not data movement — is the
  * superstep floor at bench scale. If it is, the fix is the same rule
  * stateParallelism ships for state stores: partition count tracks DATA
  * volume with the executor count as a ceiling, sized at loop entry
  * because AQE cannot size it per-stage inside the loop.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.LoopParts"
  */
object LoopParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    for (parts <- Seq(32, 16, 8, 4, 8, 16, 32)) { // mirrored to expose drift
      val s = spark.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val t0 = System.nanoTime()
      val e = operators.Graph.shipEdgesForSpec(s, sfDir)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val edgesD = e.join(deg, "src").repartition(parts, col("src"))
        .sortWithinPartitions("src").localCheckpoint(true)
      val nodes = edgesD.select(col("src").as("node")).distinct().localCheckpoint(true)
      var ranks = nodes.select(col("node"), lit(1000000L).as("r")).localCheckpoint(true)
      val tSetup = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      var prev = ranks
      for (_ <- 1 to 14) {
        val old = prev
        prev = ranks
        ranks = operators.Graph.pagerankStep(edgesD, ranks, lazyChain = true)
          .select(col("node"), col("r")).localCheckpoint(true)
        if (!(old eq prev)) operators.Checkpoints.release(old)
      }
      val top = ranks.orderBy(col("r").desc, col("node")).limit(3)
        .select(col("node")).collect().map(_.getLong(0)).toSeq
      val dt = (System.nanoTime() - t1) / 1e9
      println(f"LOOPPARTS parts=$parts%2d setup=$tSetup%5.2f loop14=$dt%6.2f s top3=$top")
      operators.Checkpoints.release(prev)
      operators.Checkpoints.release(ranks)
      operators.Checkpoints.release(edgesD)
      operators.Checkpoints.release(nodes)
      System.gc(); Thread.sleep(1000)
    }
    spark.stop()
  }
}
