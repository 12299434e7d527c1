package graft

/** Single-query timer for perf iteration: warm-up pass then min-of-2
  * timed noop-sink runs per named query (same measurement discipline as
  * Bench, without the full suite). Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.TimeQ q29_simhash_neardup"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up tolerates partial corpora (the embeddings-only scale
    // tiers carry just the table their queries read)
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      once(name) // warm-up
      val t = math.min(once(name), once(name))
      println(f"TIMEQ $name%-24s $t%8.3f s")
    }
    spark.stop()
  }
}
