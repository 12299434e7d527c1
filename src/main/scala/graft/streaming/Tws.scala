package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.Monitor.{Gauge, RegionEvent}

/** The reference's gauge/stall loop (O8/O9,
  * `/root/reference/regionSpout.go:102-117`) re-expressed on Spark 4's
  * `transformWithState` — the arbitrary-state API that replaces
  * `mapGroupsWithState`/`flatMapGroupsWithState` ([[Monitor.gauges]] keeps
  * the legacy form; this is its modern twin, byte-compatible output).
  *
  * What the new API buys at 100 TB:
  *  - **Typed, named state handles** (`ValueState`/`ListState`/`MapState`)
  *    instead of one opaque state blob — each gets its own column family
  *    in RocksDB, so a processor holding a counter AND an index doesn't
  *    rewrite both on every update.
  *  - **Explicit timers** (`registerTimer`/`handleExpiredTimer`) instead
  *    of the single per-key GroupStateTimeout — the stall deadline here is
  *    re-armed on every batch of activity and fires independently of
  *    whether new data for OTHER keys arrives.
  *  - **Native state TTL** (`TTLConfig`) — the user-universe bound the
  *    funnel variant implements by hand becomes a declarative knob.
  *  - Requires the RocksDB state store (a TWS invariant), which
  *    [[graft.Session.withRocksDBStateStore]] already provides.
  *
  * Semantics match [[Monitor.gaugeFn]] exactly: reset-on-read counts
  * (`StoreUint64(&counter, 0)`, regionSpout.go:111), a zero-count
  * `stalled=true` row when a region's timer expires with no activity.
  */
object Tws {

  /** Per-region reset-on-read gauge with an explicit stall timer. */
  class RegionGaugeProcessor(timeoutMs: Long)
      extends StatefulProcessor[String, RegionEvent, Gauge] {

    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(region: String, rows: Iterator[RegionEvent],
                                 timers: TimerValues): Iterator[Gauge] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(0L) // reset-on-read, exactly like the reference gauge
      if (timeoutMs > 0) {
        // re-arm: activity pushes the stall deadline out
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + timeoutMs)
      }
      Iterator.single(Gauge(region, n, stalled = n == 0L))
    }

    override def handleExpiredTimer(region: String, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Gauge] = {
      count.update(0L)
      // keep watching a silent region — the reference loop ticks forever
      getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + timeoutMs)
      Iterator.single(Gauge(region, 0L, stalled = true))
    }
  }

  /** [[Monitor.gauges]] on transformWithState. `timeoutMs <= 0` disables
    * the stall timer AND drops to TimeMode.None — a processing-time
    * TimeMode keeps the engine micro-batching on wall-clock to evaluate
    * timers (measured: thousands of empty epochs in minutes), exactly
    * like the legacy ProcessingTimeTimeout; None is the deterministic
    * analog of NoTimeout. */
  def gaugesTws(events: Dataset[RegionEvent], timeoutMs: Long = 30000L): Dataset[Gauge] = {
    import events.sparkSession.implicits._
    val mode = if (timeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.region)
      .transformWithState(new RegionGaugeProcessor(timeoutMs),
        mode, OutputMode.Update())
  }
}
