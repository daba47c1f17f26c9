package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Same-type run tracking — the streaming twin of the batch e98
  * profile: for every event, the length of the user's CURRENT
  * consecutive same-type run; `alerts` filters to runs ≥ a threshold
  * (a scripted view/click loop or a purchase double-submit, caught on
  * the event that crosses the line instead of in tomorrow's sweep).
  *
  * State per user is (last type, current run length, last event time)
  * — three fields regardless of event volume or run length.
  *
  * Out-of-order arrivals: within a batch, events are processed in
  * (event-time, event-id) order — the same total order the batch
  * window uses, so intra-batch disorder is repaired exactly; a
  * cross-batch late event strictly older than the stored last event
  * time is dropped (splicing it into an already-emitted run would
  * re-emit lengths for a run the consumer has already seen).
  */
object RunLengthStage {
  final case class Ev(userId: Long, eventId: Long, tsMs: Long, eventType: String)
  final case class Run(userId: Long, tsMs: Long, eventType: String, runLen: Long)
  final case class RunState(lastType: String, runLen: Long, lastMs: Long)

  def detect(events: Dataset[Ev]): Dataset[Run] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[RunState]
    implicit val outEnc = Encoders.product[Run]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[RunState, Run](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[RunState]) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Run]
          evs.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            if (st == null || e.tsMs >= st.lastMs) {
              val len = if (st != null && st.lastType == e.eventType) st.runLen + 1 else 1L
              st = RunState(e.eventType, len, e.tsMs)
              out += Run(userId, e.tsMs, e.eventType, len)
            } // else: late beyond the newest processed event — dropped
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Runs at or above the alert threshold. */
  def alerts(events: Dataset[Ev], threshold: Long = 5L): Dataset[Run] =
    detect(events).filter(_.runLen >= threshold)
}
