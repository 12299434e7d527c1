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
    * State never times out here (a funnel is open-ended); a deployment
    * that wants to bound the user universe adds an event-time timeout
    * the same way Monitor.gauges wires its processing-time one. */
  def funnelProgress(events: Dataset[FunnelEvent]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(stepFn)
  }
}
