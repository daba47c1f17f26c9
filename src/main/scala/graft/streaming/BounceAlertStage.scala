package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live bounce detection — the streaming twin of the batch e110 census:
  * when a session CLOSES (the event-time watermark passes its last
  * event + the 30-min gap) having contained exactly one event, emit a
  * Bounce carrying the landing event's type — the signal a growth team
  * wires to "this entry surface is shedding users right now" instead of
  * reading it in tomorrow's e110 rollup.
  *
  * This is the timeout-EMISSION pattern (sessionizeWithTimeout's shape):
  * output happens when state expires, not when events arrive — a bounce
  * is only knowable once the gap has provably passed. State per user is
  * (entry type, session start, last event time, event count) — four
  * fields; eviction is the emission itself, so state is O(open
  * sessions) by construction.
  *
  * Parity with e110: replaying a corpus and flushing the final sessions
  * (advance the watermark past every horizon) yields exactly the batch
  * frame's per-entry-type bounce counts — BounceParitySpec proves it on
  * the real sf0.001 events. Late events older than the stored last
  * event are dropped (the house convention); an event arriving after
  * its session already closed starts a NEW session, which matches the
  * batch gap semantics for on-time traffic. */
object BounceAlertStage {
  final case class Ev(userId: Long, eventId: Long, tsMs: Long, eventType: String)
  final case class Bounce(userId: Long, entryType: String, startMs: Long)
  final case class SessState(entryType: String, startMs: Long,
                             lastMs: Long, n: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** `events` must carry `user_id`, `event_id`, `event_type`, and an
    * `ets` timestamp column (watermark source). */
  def detect(events: DataFrame, gapMs: Long = GapMs,
             watermark: String = "10 minutes"): Dataset[Bounce] = {
    implicit val stEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[Bounce]
    implicit val inEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.TIMESTAMP, Encoders.STRING)
    events
      .withWatermark("ets", watermark)
      .select(col("user_id"), col("event_id"), col("ets"), col("event_type"))
      .as[(Long, Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, Bounce](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[(Long, Long, java.sql.Timestamp, String)],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            if (s.n == 1L) Iterator.single(Bounce(userId, s.entryType, s.startMs))
            else Iterator.empty
          } else {
            var st = state.getOption.orNull
            val out = Seq.newBuilder[Bounce]
            evs.toSeq.sortBy(e => (e._3.getTime, e._2)).foreach { e =>
              val ts = e._3.getTime
              if (st == null || ts >= st.lastMs) {
                if (st != null && ts - st.lastMs > gapMs) {
                  // previous session closed inside this batch: settle it
                  // now (the timeout would otherwise double-handle it)
                  if (st.n == 1L) out += Bounce(userId, st.entryType, st.startMs)
                  st = null
                }
                st = if (st == null) SessState(e._4, ts, ts, 1L)
                else st.copy(lastMs = ts, n = st.n + 1L)
              } // else: late beyond the newest processed event — dropped
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }
}
