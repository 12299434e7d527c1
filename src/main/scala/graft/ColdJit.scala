package graft

/** Cold-vs-warm measurement for the iterative-loop JIT cost (r11
  * verdict ask #5): times the FIRST q109 run in this fresh JVM — the
  * number a fresh cluster pays once per executor-JVM generation — then
  * the warm second run; with `prewarm` as arg 2, runs
  * [[graft.operators.Graph.jitPrewarmLoops]] (a 2-superstep synthetic
  * mini-loop) before the first timed run, so the delta attributable to
  * the pre-warm is directly readable. Numbers in PLANS.md r12.
  * Usage: `sbt "runMain graft.ColdJit /tmp/graft_sf1 [prewarm]"` */
object ColdJit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prewarm = args.lift(1).contains("prewarm")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    // parquet-footer warm-up only (same as Bench) — deliberately NOT a
    // graph query, so the loop path stays cold for the measurement
    Seq("lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("q109_pagerank_stable")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    var pw = 0.0
    if (prewarm) {
      val t0 = System.nanoTime()
      graft.operators.Graph.jitPrewarmLoops(spark)
      pw = (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warm = math.min(once(), once())
    println(f"COLDJIT dir=$sfDir prewarm=$prewarm prewarm_s=$pw%.2f cold=$cold%.2f warm=$warm%.2f")
    spark.stop()
  }
}
