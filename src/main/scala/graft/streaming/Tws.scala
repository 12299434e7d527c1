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

  /** Per-region reset-on-read gauge with an explicit stall timer.
    *
    * Deliberately STATELESS between batches (timers aside): `rows.size`
    * IS the reset-on-read count, because `handleInputRows` receives
    * every row for the key in the batch and emission happens in the same
    * call — a ValueState counter here would only ever round-trip zero
    * through RocksDB (a dead per-key write per batch, round-5 ADVICE).
    * The state-handle machinery this class no longer needs is what
    * [[RegionTotalsProcessor]] exercises for real, TTL included. */
  class RegionGaugeProcessor(timeoutMs: Long)
      extends StatefulProcessor[String, RegionEvent, Gauge] {

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(region: String, rows: Iterator[RegionEvent],
                                 timers: TimerValues): Iterator[Gauge] = {
      val n = rows.size.toLong
      if (timeoutMs > 0) {
        // re-arm: activity pushes the stall deadline out
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + timeoutMs)
      }
      Iterator.single(Gauge(region, n, stalled = n == 0L))
    }

    override def handleExpiredTimer(region: String, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Gauge] = {
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

  /** Cumulative per-region event total. */
  case class RegionTotal(region: String, total: Long)

  /** Running per-region totals with NATIVE state TTL — the declarative
    * user-universe bound. Each `update` re-arms the value's TTL clock,
    * so an ACTIVE key's total accumulates indefinitely while an IDLE
    * key's state is dropped by the store itself once `ttl` elapses with
    * no writes — no timer bookkeeping, no hand-built eviction (contrast
    * [[Funnel.funnelProgressExpiring]], which implements exactly this
    * bound with an event-time timeout and twenty lines of timer logic).
    * After expiry the key restarts from zero: at 100 TB this is how a
    * per-user/per-session state universe stays bounded by the ACTIVE
    * population instead of growing with every key ever seen.
    *
    * TTL is processing-time by API contract (`TTLConfig` has no
    * event-time form), hence TimeMode.ProcessingTime — but unlike a
    * processing-time TIMER, the TTL clock is evaluated on access/
    * maintenance, so the query still runs deterministic batches. */
  class RegionTotalsProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, RegionEvent, RegionTotal] {

    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total", Encoders.scalaLong,
        TTLConfig(ttl))

    override def handleInputRows(region: String, rows: Iterator[RegionEvent],
                                 timers: TimerValues): Iterator[RegionTotal] = {
      // an expired value reads back as absent — exists() IS the TTL gate
      val t = (if (total.exists()) total.get() else 0L) + rows.size
      total.update(t) // write re-arms the TTL
      Iterator.single(RegionTotal(region, t))
    }
  }

  /** [[RegionTotalsProcessor]] as a query stage. `ttl` must be positive
    * and finite — an unbounded-universe variant without TTL is exactly
    * the trap this operator exists to close. */
  def regionTotalsTws(events: Dataset[RegionEvent],
                      ttl: java.time.Duration): Dataset[RegionTotal] = {
    require(!ttl.isZero && !ttl.isNegative, s"ttl must be positive, got $ttl")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.region)
      .transformWithState(new RegionTotalsProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Input token for the streaming heavy-hitters sketch: `token` is
    * whatever the caller wants ranked — user ids for hot-key/skew
    * detection, words for trending terms. */
  case class RegionToken(region: String, token: String)

  /** One sketch candidate after a batch: estimate + tokens processed so
    * far for this region (the audit denominator: MG guarantees
    * exact − n/(k+1) ≤ est ≤ exact, no false negatives above n/(k+1)). */
  case class Trending(region: String, token: String, est: Long, n: Long)

  /** Streaming Misra–Gries heavy hitters per region — [[graft.functions
    * .HeavyHitters.MGAgg]]'s batch sketch as CONTINUOUS state, the
    * operational form of skew detection: the per-region hot keys this
    * surfaces are precisely the keys the batch engine salts
    * (`Skew.q51`). State is one `MapState` (token → counter, ≤ k
    * entries) plus a processed-count `ValueState`. MapState is the
    * right shape here and the reason this isn't a ValueState[Map]: each
    * counter is its own RocksDB entry, so a batch that touches 3 of k
    * counters writes 3 entries, not a re-serialized blob of all k.
    *
    * Transition parity is BY CONSTRUCTION: each batch folds its rows
    * through `MGAgg.reduce` itself (not a reimplementation), so the
    * streamed sketch after batches b₁…bₙ equals the batch Aggregator
    * over the same row sequence — the spec pins this with a
    * deterministic token script. Emission: the candidate set after each
    * batch, (est desc, token) ordered, Update mode. */
  class RegionHeavyHittersProcessor
      extends StatefulProcessor[String, RegionToken, Trending] {

    @transient private var counters: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var processed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("counters",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      processed = getHandle.getValueState[Long]("processed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(region: String, rows: Iterator[RegionToken],
                                 timers: TimerValues): Iterator[Trending] = {
      val before: Map[String, Long] = counters.iterator().toMap
      val n0 = if (processed.exists()) processed.get() else 0L
      val after = rows.foldLeft(
        graft.functions.HeavyHitters.MGBuf(before, n0)) { (b, r) =>
        graft.functions.HeavyHitters.MGAgg.reduce(b, r.token)
      }
      // write back as a DIFF: only touched entries hit RocksDB
      (before.keySet -- after.counts.keySet).foreach(counters.removeKey)
      after.counts.foreach { case (t, c) =>
        if (before.get(t) != Some(c)) counters.updateValue(t, c)
      }
      processed.update(after.processed)
      after.counts.toSeq.sortBy { case (t, c) => (-c, t) }.iterator
        .map { case (t, c) => Trending(region, t, c, after.processed) }
    }
  }

  /** [[RegionHeavyHittersProcessor]] as a query stage (k is the batch
    * sketch's `HeavyHitters.k` — stream and batch answer the same
    * question with the same memory bound). */
  def trendingTws(tokens: Dataset[RegionToken]): Dataset[Trending] = {
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(_.region)
      .transformWithState(new RegionHeavyHittersProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Input value for the streaming quantile sketch: `v` is whatever
    * distribution the caller watches — event values for an ops
    * dashboard, document lengths for a corpus monitor. */
  case class RegionValue(region: String, v: Double)

  /** One quantile gauge after a batch: exactly-tracked count + p50/p95
    * estimates from the region's cumulative KLL sketch. */
  case class QuantileGauge(region: String, n: Long, p50: Double, p95: Double)

  /** Streaming KLL quantiles per region — `Sketches.q125`'s mergeable
    * distribution sketch as CONTINUOUS state, completing the streaming
    * sketch pair (trendingTws holds frequent items; this holds the
    * value DISTRIBUTION — the latency/size percentile dashboard that
    * batch percentile() can only recompute from scratch).
    *
    * State is one `ValueState[Array[Byte]]` blob per region —
    * deliberately NOT MapState (the MG counters' shape): KLL's
    * compactor rewrites whole internal levels on overflow, so there is
    * no entry-level diff to exploit; the sketch IS one ~KB compact
    * blob, and one value write per region per batch is the minimal
    * RocksDB traffic.
    *
    * Transition parity is BY CONSTRUCTION: each batch builds a plain
    * KLL over its own rows and folds it into the stored blob through
    * `Sketches.kllMergeBlobs` — the SAME kernel q125's two merge
    * layers use — so the streamed state after batches b₁…bₙ is exactly
    * a kllMergeBlobs fold over per-batch sketches of the same rows.
    * The COUNT is exact under any batching (KLL tracks N exactly;
    * StreamingSpec pins it), and while compaction randomness means
    * byte-level equality with a one-pass batch sketch isn't guaranteed
    * in general, below the sketch's k the sketch stores every value and
    * the streamed quantiles EQUAL the batch-built ones deterministically
    * — the spec's script stays under k to pin that. */
  class RegionQuantilesProcessor
      extends StatefulProcessor[String, RegionValue, QuantileGauge] {

    @transient private var sketch: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(region: String, rows: Iterator[RegionValue],
                                 timers: TimerValues): Iterator[QuantileGauge] = {
      import graft.operators.Sketches
      val batchSk = org.apache.datasketches.kll.KllDoublesSketch
        .newHeapInstance(Sketches.kllK)
      rows.foreach(r => batchSk.update(r.v))
      val prev = if (sketch.exists()) sketch.get() else Array.emptyByteArray
      val merged = Sketches.kllMergeBlobs(prev, batchSk.toByteArray)
      sketch.update(merged)
      val sk = Sketches.kllHeapify(merged)
      val inc = org.apache.datasketches.quantilescommon
        .QuantileSearchCriteria.INCLUSIVE
      Iterator.single(QuantileGauge(region, sk.getN,
        sk.getQuantile(0.5, inc), sk.getQuantile(0.95, inc)))
    }
  }

  /** [[RegionQuantilesProcessor]] as a query stage (k is the batch
    * sketch's `Sketches.kllK` — stream and batch answer the same
    * question with the same memory bound). */
  def quantilesTws(values: Dataset[RegionValue]): Dataset[QuantileGauge] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.region)
      .transformWithState(new RegionQuantilesProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stateful-shuffle parallelism for a REGION-keyed stream: the key
    * universe is the geo catalog, so the state-store count must track
    * CATALOG size, not executor count. Each stateful partition is a
    * whole store instance paying per-batch open/commit/fsync whether or
    * not it holds a key — with the default 32 shuffle partitions and a
    * 2-region catalog, 27+ empty RocksDB instances commit concurrently
    * every batch and their fsync/snapshot traffic contends on one disk:
    * measured round 8 at sf0.1 (8 batches), 32 stores → 8–16 s wall /
    * 130–210 s Σcommit (and 2.4× run-to-run variance — the r7 "s03
    * drift" was this distribution being sampled, not a regression),
    * 5 stores → 3.6 s wall / 3 s Σcommit, flat. ×2 headroom over the
    * catalog keeps a slot free for skewed/unmatched keys; the floor
    * keeps a one-region catalog from serializing. Set
    * `spark.sql.shuffle.partitions` to this BEFORE the first start of a
    * region-keyed stateful query (the store count is pinned into the
    * checkpoint at first run). */
  def regionStateParallelism(catalogSize: Int): Int =
    math.max(4, 2 * catalogSize)

  /** The same rule generalized to any key universe (round 10, r8 ask
    * #3): per-batch state-commit work is ~(fixed per-store cost ×
    * stores) + (row cost × keys), and the fixed term dominates until a
    * store holds on the order of a couple hundred keys. s02's funnel
    * (1,500 user keys) measured at sf0.1, 8 batches, min-of-2:
    * 32 stores → 6.4 s wall / 71.6 s Σcommit; 16 → 4.0 / 17.5;
    * 8 → 3.5 / 3.8 — an 18× commit-draw cut from sizing stores to the
    * key universe, the direct sequel to regionStateParallelism's
    * empty-store finding. One store per ~192 keys puts 1,500 keys at 8
    * stores (the measured knee); the ceiling keeps a corpus-sized key
    * universe from exceeding the executor-sized shuffle parallelism —
    * at 10⁹ keys this returns `ceiling`, which is correct: every store
    * is then row-cost-dominated. Same checkpoint pin as above: set
    * BEFORE the query's first start.
    *
    * MECHANISM, corrected round 11 (`graft.StoreDirs`, one layout per
    * JVM — Spark caches resolved local dirs per process): at the 5×
    * corpus (7,500 keys), 32 vs 8 stores measured Σcommit 82/78 → 3.6/
    * 3.9 s on one disk, 70/81 → 3.8/4.6 s on PURE TMPFS, 74/89 → 4.4/
    * 3.7 s split across both devices — and four dirs on one device made
    * it WORSE (150/125 s). A zero-latency medium does not dent the
    * per-store draw, so it is per-store COMPUTE (changelog commit +
    * snapshot/version bookkeeping per instance), not fsync contention
    * as round 10 argued. Consequences for the rule: (1) a real cluster
    * spreads the draw across executor CORES — faster local disks or
    * more local dirs buy nothing; (2) sizing the store count to the key
    * universe is not a single-disk workaround but the fix everywhere —
    * ~4 s Σcommit on every layout at the key-sized count. */
  def stateParallelism(keyUniverse: Long, ceiling: Int): Int =
    math.max(1, math.min(ceiling.toLong, keyUniverse / 192L + 1L).toInt)

  /** Input for the rolling feature window: one measurement per event.
    * `event_id` rides along solely as the timestamp tie-break — the
    * batch twin q107 keeps its last-10 by (ts DESC, event_id DESC), so
    * the stream must order/evict by the SAME total order or a tie at
    * the eviction boundary keeps different event sets in the two
    * engines (round-6 ADVICE; the shipped corpus has no ts ties, so
    * only the discipline — not the corpus — guards this). */
  case class UserValue(user_id: Long, event_id: Long, value: Double,
                       ts: java.sql.Timestamp)

  /** A buffered window entry (event-time micros + id tie-break + value).
    *
    * STATE-SCHEMA PIN: this shape IS the ListState encoder schema of
    * [[featureWindowTws]] — any field change (the round-7 addition of
    * `eventId` included) is a state-schema break, and a checkpoint
    * written under the old shape fails restore with
    * STATE_STORE_SCHEMA_INCOMPATIBLE rather than silently misreading
    * bytes. That is the intended failure: bump/clear the checkpoint
    * directory when evolving this class. Bench and specs are immune —
    * they always start from fresh checkpoints. */
  case class WinEvent(tsUs: Long, eventId: Long, value: Double)

  /** Per-user features over the last ≤ maxN events, refreshed per batch. */
  case class UserFeatures(user_id: Long, n: Int, mean: Double,
                          vmin: Double, vmax: Double, latest_us: Long)

  /** Rolling last-N feature window per user on `ListState` — the online
    * feature-generation pattern ("mean amount over the user's last 10
    * transactions") that serving-side fraud/reco models read, and the
    * third TWS state shape after ValueState (+TTL) and MapState, each
    * used where its RocksDB write profile is the right one:
    *
    *  - the COMMON batch (in-order arrivals, window not yet full) is
    *    `appendList` — ListState's append is a RocksDB merge-op, so the
    *    existing buffer is NOT read-modify-written; cost is O(new
    *    events), however large the buffer;
    *  - only overflow or out-of-order arrivals pay the `put` rewrite,
    *    and the rewrite is bounded by maxN.
    *
    * Per-key state is BOUNDED (≤ maxN entries) by construction — this
    * operator needs no TTL to stay finite per key, though the key
    * UNIVERSE would compose with [[RegionTotalsProcessor]]-style TTL on
    * an open stream. Events fold in (event-time, event_id) order (the
    * funnel's discipline + q107's tie-break), so intra-batch arrival
    * order never changes the window.
    *
    * LATE-DATA CONTRACT (pinned, spec-verified): a late event is merged
    * by its EVENT time — it re-slots into the window wherever
    * (ts, event_id) puts it, and an event older than the window's
    * oldest entry once the window is full is DROPPED by the takeRight
    * trim. Both halves are exactly the batch twin's semantics (q107
    * keeps the global last-10 regardless of arrival order), so
    * stream ≡ batch holds for ANY arrival order once all events have
    * arrived; there is no watermark cutoff in either engine. The cost
    * asymmetry is the only difference: a late arrival pays the bounded
    * (≤ maxN) buffer rewrite instead of the merge-op append. */
  class FeatureWindowProcessor(maxN: Int)
      extends StatefulProcessor[Long, UserValue, UserFeatures] {
    require(maxN > 0, s"maxN must be positive, got $maxN")

    @transient private var window: org.apache.spark.sql.streaming.ListState[WinEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      window = getHandle.getListState[WinEvent]("window",
        Encoders.product[WinEvent], TTLConfig.NONE)

    private def toUs(t: java.sql.Timestamp): Long =
      java.time.temporal.ChronoUnit.MICROS
        .between(java.time.Instant.EPOCH, t.toInstant)

    override def handleInputRows(user: Long, rows: Iterator[UserValue],
                                 timers: TimerValues): Iterator[UserFeatures] = {
      // total order = (event time, event_id): q107's ORDER BY ts DESC,
      // event_id DESC read ascending — ties at the eviction boundary
      // keep the same event set in both engines
      val incoming = rows.map(r => WinEvent(toUs(r.ts), r.event_id, r.value))
        .toArray.sortBy(e => (e.tsUs, e.eventId))
      val cur = window.get().toArray // maintained oldest → newest
      val inOrder = cur.isEmpty || incoming.headOption.forall(h =>
        h.tsUs > cur.last.tsUs ||
          (h.tsUs == cur.last.tsUs && h.eventId >= cur.last.eventId))
      val kept =
        if (inOrder && cur.length + incoming.length <= maxN) {
          window.appendList(incoming) // merge-op append: buffer never rewritten
          cur ++ incoming
        } else {
          val merged = (cur ++ incoming).sortBy(e => (e.tsUs, e.eventId))
            .takeRight(maxN)
          window.put(merged) // overflow / late arrival: bounded rewrite
          merged
        }
      val vs = kept.map(_.value)
      Iterator.single(UserFeatures(user, kept.length, vs.sum / kept.length,
        vs.min, vs.max, kept.last.tsUs))
    }
  }

  /** [[FeatureWindowProcessor]] as a query stage. */
  def featureWindowTws(events: Dataset[UserValue],
                       maxN: Int = 10): Dataset[UserFeatures] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FeatureWindowProcessor(maxN),
        TimeMode.None(), OutputMode.Update())
  }
}
