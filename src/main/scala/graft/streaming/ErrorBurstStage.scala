package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Error-burst detection — the streaming twin of the batch e97 screen:
  * for every error event, the number of that user's errors in the
  * trailing `windowMs` (5 min) of EVENT time; `alerts` filters to
  * bursts ≥ a threshold (a stuck client / rage loop, caught live
  * instead of in tomorrow's batch sweep).
  *
  * State per user is the timestamps inside one trailing window —
  * bounded by window width × the user's error rate, NOT by history
  * (every event prunes the buffer), so state stays O(active bursts).
  *
  * Out-of-order arrivals: within a batch, events are processed in
  * event-time order (intra-batch disorder repaired exactly); a
  * cross-batch late event strictly older than the newest stored
  * timestamp is dropped — it can no longer change any future burst
  * count, and counting it against an already-emitted window would
  * double-fire. Equal-timestamp arrivals still count (the batch RANGE
  * frame treats ties as peers, so the LAST member of a tie group
  * carries the full group count — the per-user max matches the batch
  * frame either way, which is what ErrorBurstParitySpec pins).
  */
object ErrorBurstStage {
  final case class Ev(userId: Long, tsMs: Long)
  final case class Burst(userId: Long, tsMs: Long, count: Long)
  final case class BurstState(recent: Seq[Long])

  val WindowMs: Long = 5L * 60 * 1000

  def detect(events: Dataset[Ev], windowMs: Long = WindowMs): Dataset[Burst] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[BurstState]
    implicit val outEnc = Encoders.product[Burst]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[BurstState, Burst](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[BurstState]) =>
          var buf = state.getOption.map(_.recent).getOrElse(Seq.empty)
          val out = Seq.newBuilder[Burst]
          evs.map(_.tsMs).toSeq.sorted.foreach { ts =>
            if (buf.isEmpty || ts >= buf.last) {
              buf = (buf :+ ts).dropWhile(_ < ts - windowMs)
              out += Burst(userId, ts, buf.size.toLong)
            } // else: late beyond the newest stored event — dropped
          }
          state.update(BurstState(buf))
          out.result().iterator
      }
  }

  /** Bursts at or above the alert threshold (e97's ≥3-in-5-min shape). */
  def alerts(events: Dataset[Ev], threshold: Long = 3L,
             windowMs: Long = WindowMs): Dataset[Burst] =
    detect(events, windowMs).filter(_.count >= threshold)
}
