package graft

import org.apache.spark.sql.functions._

/** Executor-loss fault injection for the STATEFUL STREAMING path —
  * FaultProbe's matrix extended to RocksDB state under
  * `local-cluster`: the funnel (flatMapGroupsWithState over RocksDB
  * stores with changelog checkpointing, s02's query) is run twice over
  * the same 8-file staged source — a clean baseline, then a run with a
  * worker executor kill -9'd mid-stream. Structured Streaming's
  * contract under executor loss is task retry + state-store reload
  * from the last committed version (+changelog); the probe asserts the
  * final per-user funnel state of the kill run is IDENTICAL to the
  * baseline. Each micro-batch lands via dynamic partition overwrite
  * keyed by batch id, so a retried batch overwrites itself
  * (idempotent) instead of double-appending.
  *
  * Usage (after `sbt package`):
  * `SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]'
  *  sbt "runMain graft.StreamFaultProbe /root/testdata/sf0.1 [killAt=MS]"`
  * Results in PLANS.md r12. */
object StreamFaultProbe {

  import ProbeKit.executorPids

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val killAt = args.collectFirst {
      case a if a.startsWith("killAt=") => a.stripPrefix("killAt=").toLong
    }.getOrElse(1500L)
    val spark = Session.withRocksDBStateStore(
      Session.builderFromEnv(16, 16)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_streamfault").toString
    // the same staged source for both runs: identical files, identical
    // micro-batch boundaries (maxFilesPerTrigger=1 → 8 batches)
    val src = s"$root/src"
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(8).write.parquet(src)
    val keys = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.streaming.Tws.stateParallelism(keys, 16).toString)

    def runOnce(tag: String): Map[Long, String] = {
      val out = s"$root/out_$tag"
      import spark.implicits._
      val ev = graft.streaming.Ingest.eventsFileStream(spark, src, maxFilesPerTrigger = 1)
        .select(col("user_id"), col("event_type"), col("ts"))
        .as[graft.streaming.Funnel.FunnelEvent]
      val q = graft.streaming.Funnel.funnelProgress(ev).writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.Funnel.FunnelProgress],
           id: Long) =>
            graft.sources.Layout.overwritePartitions(
              b.toDF().withColumn("batch", lit(id)), out, Seq("batch"))
        }
        .outputMode("update")
        .option("checkpointLocation", s"$root/ckpt_$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(300000L), s"$tag stream timed out")
      finally q.stop()
      // final state per user = the LAST update emitted for that user
      import org.apache.spark.sql.expressions.Window
      spark.read.parquet(out)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("batch").desc, col("steps").desc)))
        .filter(col("__rn") === 1)
        .select(col("user_id"), concat_ws("|", col("steps"),
          col("signup_ts"), col("click_ts"), col("purchase_ts")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }

    val baseline = runOnce("base")
    println(s"STREAMFAULT baseline users=${baseline.size}")
    require(executorPids().size >= 2, "need 2 separate executor processes")
    val killer = ProbeKit.killExecutorAfter(killAt, "STREAMFAULT")
    val killed = runOnce("kill")
    killer.join(30000)
    val same = killed == baseline
    println(s"STREAMFAULT during_kill survived=true identical=$same users=${killed.size}")
    require(same, {
      val diff = (baseline.keySet ++ killed.keySet)
        .filter(k => baseline.get(k) != killed.get(k)).take(5)
      s"final funnel state diverged after executor kill at users $diff"
    })
    println("STREAMFAULT ALL OK")
    spark.stop()
  }
}
