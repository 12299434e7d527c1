package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Geo

/** Streaming monitor — the reference's 30 s throughput loop
  * (`/root/reference/regionSpout.go:102-117`) as streaming queries.
  *
  * Two forms:
  *  - [[regionCounts]]: event-time 30 s tumbling counts per region with a
  *    watermark — the declarative, scale-correct form (partial agg before
  *    the exchange; state bounded by the watermark).
  *  - [[gauges]]: exact reset-on-read gauge semantics
  *    (`regionSpout.go:108-111`: read counter, print, zero it) via
  *    `flatMapGroupsWithState`, including the stalled-region zero-count
  *    emission the reference stubbed out (`regionSpout.go:113-115`).
  */
object Monitor {

  /** Input row for the gauge pipeline. */
  case class RegionEvent(region: String, ts: java.sql.Timestamp)

  /** Gauge emission: events seen since last emission for this region. */
  case class Gauge(region: String, n: Long, stalled: Boolean)

  /** O8: 30 s tumbling per-region counts. Watermark bounds state: windows
    * older than maxEventTime - delay are finalized and evicted, so state
    * size is O(regions × windows-in-flight) — constant at any input
    * scale. */
  def regionCounts(events: DataFrame, watermarkDelay: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "30 seconds"), col("region"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("region"), col("n"))

  /** Events → assigned-region stream ready for [[regionCounts]]. */
  def assignedEvents(spark: SparkSession, events: DataFrame): DataFrame =
    Geo.assignRegion(spark, events)

  /** State-transition function for the reset-on-read gauge; public-ish so
    * the spec can drive it directly with TestGroupState (timeout branch is
    * wall-clock-dependent inside a real query). State is the count carried
    * since the last emission — always reset to 0 on emit, exactly like
    * `StoreUint64(&counter, 0)` at regionSpout.go:111. */
  private[graft] def gaugeFn(timeoutMs: Option[Long])(
      region: String, events: Iterator[RegionEvent],
      state: GroupState[Long]): Iterator[Gauge] = {
    if (state.hasTimedOut) {
      // silent region: emit the stalled zero the reference only stubbed
      state.update(0L)
      timeoutMs.foreach(state.setTimeoutDuration)
      Iterator.single(Gauge(region, 0L, stalled = true))
    } else {
      val n = state.getOption.getOrElse(0L) + events.size
      state.update(0L) // reset-on-read
      timeoutMs.foreach(state.setTimeoutDuration)
      Iterator.single(Gauge(region, n, stalled = n == 0L))
    }
  }

  /** O8/O9 with exact reference semantics: per-region reset-on-read counts,
    * stalled regions emitting zeros on processing-time timeout.
    * `timeoutMs = None` disables the stall timeout (NoTimeout) — needed by
    * deterministic tests, since ProcessingTimeTimeout keeps a query
    * re-triggering on wall-clock. */
  def gauges(events: Dataset[RegionEvent],
             timeoutMs: Option[Long] = Some(30000L)): Dataset[Gauge] = {
    import events.sparkSession.implicits._
    val conf =
      if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.region)
      .flatMapGroupsWithState[Long, Gauge](OutputMode.Append(), conf)(gaugeFn(timeoutMs))
  }

  /** O9 batch-side stall check for foreachBatch: catalog regions absent
    * from a micro-batch's counts. */
  def stalledRegions(spark: SparkSession, counts: DataFrame): DataFrame = {
    import spark.implicits._
    val catalog = Geo.usaCatalog.map(_.id).toDF("region")
    catalog.join(counts, Seq("region"), "left")
      .filter(col("n").isNull || col("n") === 0L)
      .select(col("region"))
  }

  /** The complete monitor pipeline (EP3, regionSpout.go:102-117) as one
    * streaming query: assigned events → watermarked 30 s window counts →
    * per-micro-batch stall annotation via foreachBatch (counts outer-join
    * the catalog, silent regions flagged) → caller's collector. */
  def monitorQuery(spark: SparkSession, events: DataFrame,
                   collect: (DataFrame, Long) => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val catalog = Geo.usaCatalog.map(_.id).toDF("cat_region")
    regionCounts(assignedEvents(spark, events))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val annotated = broadcast(catalog)
          .join(batch, catalog("cat_region") === batch("region"), "left")
          .select(col("cat_region").as("region"), col("w_start"),
            coalesce(col("n"), lit(0L)).as("n"),
            (col("n").isNull || col("n") === 0L).as("stalled"))
        collect(annotated, id)
      }
      .start()
  }

  /** O11 (regionSpout.go:105-110): the monitor display — per-trigger counts
    * to the console, update mode like the reference's overwrite-in-place
    * screen. Returned started. */
  def consoleSink(counts: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    counts.writeStream.format("console")
      .outputMode("update").option("truncate", false).start()

  /** O12 (regionSpout.go:120-123, unreachable in the reference): graceful
    * shutdown that actually runs — stop every active streaming query. */
  def stopAll(spark: SparkSession): Unit =
    spark.streams.active.foreach(_.stop())

  /** O9 action (regionSpout.go:113-115 — the reference detected a stalled
    * region and left the restart branch EMPTY; this is that branch made
    * real): supervise a streaming query, and when the stall predicate
    * fires, stop it and start a fresh run from the same factory. Because
    * the factory reuses the checkpoint location, the restart is
    * exactly-once — the new run resumes from committed offsets, already-
    * processed input is not re-emitted.
    *
    * `checkOnce` is one deterministic supervision tick (what a 30 s
    * scheduler — or the reference's monitor goroutine — would invoke);
    * StreamingSpec drives it directly so the restart path is testable
    * without wall-clock coupling. `maxRestarts` bounds flapping: a query
    * stalled by a persistent fault escalates instead of spinning. */
  final class StallSupervisor(
      start: () => org.apache.spark.sql.streaming.StreamingQuery,
      isStalled: org.apache.spark.sql.streaming.StreamingQuery => Boolean,
      maxRestarts: Int = 3) {

    @volatile private var current = start()
    @volatile private var restarts = 0

    def query: org.apache.spark.sql.streaming.StreamingQuery = current
    def restartCount: Int = restarts
    def exhausted: Boolean = restarts >= maxRestarts

    /** One supervision tick; returns true if a restart happened. */
    def checkOnce(): Boolean =
      if (isStalled(current) && !exhausted) {
        current.stop()
        // a CRASHED query rethrows its failure from awaitTermination —
        // swallow it here: the restart is the handling, and the
        // maxRestarts budget (not the exception) decides when to give up
        try current.awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        current = start()
        restarts += 1
        true
      } else false
  }
}
