package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch funnel (`Windows.q80Funnel`): per-user
  * signup → click → purchase sequence detection over an unbounded
  * stream, with BOUNDED per-user state — exactly three optional
  * timestamps, never an event history (the same unbounded-state trap
  * q80's scaladoc calls out applies doubly in streaming, where the
  * buffer would also never be evicted).
  *
  * Semantics are monotone refinement: each stage keeps the EARLIEST
  * qualifying event seen so far (a late-arriving earlier click can
  * improve click_ts; stages already reached are never retracted —
  * re-deriving downstream stages on upstream refinement would need the
  * dropped history, which is the batch job's business: q80 over the
  * lake is the exact recompute, this operator is the low-latency
  * monotone approximation, and under in-order delivery the two agree
  * exactly).
  *
  * Emission: one row per user per micro-batch in which the user's
  * state ADVANCED (new stage reached or a stage timestamp improved) —
  * update-mode output, keyed by user.
  */
object Funnel {

  case class FunnelEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelState(signup: Option[Long], click: Option[Long],
                         purchase: Option[Long])
  case class FunnelProgress(user_id: Long, steps: Int,
                            signup_ts: Option[java.sql.Timestamp],
                            click_ts: Option[java.sql.Timestamp],
                            purchase_ts: Option[java.sql.Timestamp])

  // State keeps EPOCH-MICROS, not Timestamp.getTime millis: the corpus
  // carries microsecond timestamps, and millisecond truncation would
  // reject a click 500 µs after its signup (same millisecond → not
  // strictly greater) where batch q80 counts it — breaking the
  // documented in-order-delivery agreement, and emitting timestamps
  // that never byte-match q80's.
  private def toMicros(t: java.sql.Timestamp): Long =
    java.time.temporal.ChronoUnit.MICROS
      .between(java.time.Instant.EPOCH, t.toInstant)

  private def toTs(o: Option[Long]): Option[java.sql.Timestamp] =
    o.map(us => java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)))

  /** Pure per-group transition — factored for direct spec coverage with
    * TestGroupState. Events are folded in event-time order within the
    * batch so intra-batch ordering can't depend on arrival order. */
  private[streaming] def stepFn(user: Long, events: Iterator[FunnelEvent],
                                state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
    val prev = state.getOption.getOrElse(FunnelState(None, None, None))
    var s = prev
    events.toSeq.sortBy(e => toMicros(e.ts)).foreach { e =>
      val t = toMicros(e.ts)
      e.event_type match {
        case "signup" if s.signup.forall(t < _) =>
          s = s.copy(signup = Some(t))
        case "click" if s.signup.exists(_ < t) && s.click.forall(t < _) =>
          s = s.copy(click = Some(t))
        case "purchase" if s.click.exists(_ < t) && s.purchase.forall(t < _) =>
          s = s.copy(purchase = Some(t))
        case _ => ()
      }
    }
    if (s == prev) Iterator.empty
    else {
      state.update(s)
      val steps =
        if (s.purchase.isDefined) 3 else if (s.click.isDefined) 2
        else if (s.signup.isDefined) 1 else 0
      Iterator.single(FunnelProgress(user, steps,
        toTs(s.signup), toTs(s.click), toTs(s.purchase)))
    }
  }

  /** The streaming funnel: per-user bounded-state sequence detection.
    * Per-user state is three timestamps (bounded), but the USER UNIVERSE
    * is not — on an open-ended stream use [[funnelProgressExpiring]],
    * which evicts idle users by event-time timeout. This variant keeps
    * every user forever and exists for exact agreement with batch q80
    * over any replay window. */
  def funnelProgress(events: Dataset[FunnelEvent]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(stepFn)
  }

  /** Eviction wrapper around [[stepFn]]: identical funnel transitions
    * while a user is active, plus an event-time eviction clock. Each
    * batch with activity re-arms the timeout to (latest event time +
    * idle gap); when the stream's watermark passes it, the user's
    * state is dropped. Factored for direct TestGroupState coverage of
    * the timeout branch. */
  private[graft] def expiringStepFn(idleGapMs: Long)(
      user: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelProgress] = {
    if (state.hasTimedOut) {
      // idle past the gap: drop the state. No emission — eviction is a
      // state-size decision, not a funnel event; a user who returns
      // later simply restarts from scratch.
      state.remove()
      Iterator.empty
    } else {
      val evs = events.toSeq
      val out = stepFn(user, evs.iterator, state)
      if (state.exists) {
        // re-arm on ANY activity (even non-advancing events prove the
        // user is alive). Millisecond floor is fine here: the eviction
        // clock is a horizon, not funnel ordering — stepFn keeps its
        // micros. Clamp above the watermark: Spark rejects a timeout
        // already in the past.
        val lastActivityMs = evs.map(_.ts.getTime).max
        state.setTimeoutTimestamp(
          math.max(lastActivityMs + idleGapMs, state.getCurrentWatermarkMs + 1))
      }
      out
    }
  }

  /** The production form at 100 TB: funnel detection with a BOUNDED
    * user universe. Users idle longer than `idleGap` (in event time,
    * judged against the watermark) are evicted; active users see
    * byte-identical output to [[funnelProgress]] — the transition
    * function is shared, eviction only removes state that the
    * open-ended variant would have kept idle forever. */
  def funnelProgressExpiring(events: Dataset[FunnelEvent],
                             watermarkDelay: String,
                             idleGap: java.time.Duration): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout)(
        expiringStepFn(idleGap.toMillis))
  }
}
