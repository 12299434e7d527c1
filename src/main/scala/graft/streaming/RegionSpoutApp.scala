package graft.streaming

import org.apache.spark.sql.functions._
import graft.Session
import graft.operators.Geo

/** The reference's `main()` (`/root/reference/regionSpout.go:57-124`)
  * re-expressed as one Spark application: catalog load → streaming ingest
  * → region envelope → per-region routed sink, with the 30 s monitor as a
  * second query over the same source — a user of the reference runs this
  * instead of the Go binary.
  *
  * Usage:
  *   runMain graft.streaming.RegionSpoutApp \
  *     <locations.json> <eventsDir> <outDir> <checkpointRoot>
  *
  * Differences from the reference, all strictly stronger (SURVEY §7.4):
  * exactly-once file sink vs at-most-once fire-and-forget; no 30 s
  * per-region connection stagger (source partitions fan out instead,
  * `regionSpout.go:98`); stall handling is checkpoint recovery + flags
  * rather than an empty `if` (`regionSpout.go:113-115`); shutdown hook
  * actually runs (`regionSpout.go:120-123` was unreachable).
  */
object RegionSpoutApp {
  def main(args: Array[String]): Unit = {
    val Array(locationsPath, eventsDir, outDir, ckptRoot) = args.take(4)
    val spark = Session.get()

    // O1: catalog from locations.json — same file format the reference
    // parses (regionSpout.go:169-184), quirks preserved
    val catalog = Geo.loadCatalog(spark, locationsPath).collect().map { r =>
      Geo.Region(r.getAs[String]("name"), r.getAs[String]("id"),
        r.getAs[Double]("centerLat"), r.getAs[Double]("centerLon"),
        r.getAs[Double]("north"), r.getAs[Double]("east"),
        r.getAs[Double]("south"), r.getAs[Double]("west"))
    }.toSeq
    require(catalog.size <= 25, // regionSpout.go:77's cap, kept as a sanity bound
      s"catalog has ${catalog.size} regions; the reference caps at 25 — " +
        "use Geo.assignRegionViaJoin for larger catalogs")

    // O2→O7: ingest → envelope → per-region partitioned sink, run under
    // the stall supervisor (O9's restart action): a crashed sink restarts
    // from its checkpoint — exactly-once across the restart — up to the
    // flap budget. The reference detected stalls and left the restart
    // branch empty (regionSpout.go:113-115).
    def startSink() = {
      val events = Ingest.eventsFileStream(spark, eventsDir)
      val assigned = Geo.withPoint(events)
        .withColumn("region", Geo.regionIdFor(catalog, col("lon"), col("lat")))
      val envelope = assigned.filter(col("region") =!= "NONE")
        .select(
          col("event_id").cast("string").as("id"),
          col("props").as("text"),
          col("region"),
          concat(lit("raw-tweets-"), col("region")).as("topic"))
      envelope.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$ckptRoot/sink")
        .partitionBy("region")
        .outputMode("append")
        .start()
    }
    val sink = new Monitor.StallSupervisor(
      startSink _,
      isStalled = q => !q.isActive && q.exception.isDefined)

    // O8/O11: the 30 s monitor as its own query on the same source
    val monitor = Monitor.regionCounts(
        Geo.withPoint(Ingest.eventsFileStream(spark, eventsDir))
          .withColumn("region", Geo.regionIdFor(catalog, col("lon"), col("lat"))))
      .writeStream.format("console")
      .option("checkpointLocation", s"$ckptRoot/monitor")
      .outputMode("update")
      .start()

    // O12: reachable shutdown, unlike the reference's dead code
    sys.addShutdownHook(Monitor.stopAll(spark))
    // supervision on the reference's 30 s cadence (regionSpout.go:102):
    // clean stop exits; a crash restarts from checkpoint until the
    // budget is spent, then the failure propagates
    var running = true
    while (running) {
      // awaitTermination RETHROWS the query's failure when it crashed —
      // catch it so the crash falls through to the supervisor instead of
      // killing the app before checkOnce ever runs
      try sink.query.awaitTermination(30000L)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      if (!sink.query.isActive) {
        if (sink.query.exception.isEmpty) running = false // clean stop
        else if (!sink.checkOnce()) sink.query.awaitTermination() // budget spent: rethrow
      }
    }
    monitor.awaitTermination()
  }
}
