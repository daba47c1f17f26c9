package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key rate-quota enforcement: at most `maxPerWindow` events per key
  * per tumbling event-time window; excess events are EMITTED with
  * `kept = false` (not silently dropped) so downstream can route them to
  * a dead-letter sink — the ingestion guard that keeps one runaway
  * producer/bot from flooding everything after it.
  *
  * State per key is a single (windowStart, count) pair — O(active keys),
  * independent of event volume; an event-time timeout evicts keys idle
  * past their window end + watermark, so dead keys don't accumulate.
  *
  * Semantics: events are processed in event-time order WITHIN a
  * micro-batch; the counter carries across batches for the same window,
  * so a flood split over several batches is still capped. Late events
  * for an ALREADY-ADVANCED window (out-of-order beyond a batch) count
  * against the current window's quota rather than resurrecting the old
  * one — the cheap deterministic choice; widen the watermark if exact
  * late accounting matters.
  */
object QuotaStage {
  final case class Counter(windowStartMs: Long, n: Long)
  final case class Quoted(userId: Long, tsMs: Long, kept: Boolean)

  val WindowMs: Long = 60L * 60 * 1000

  /** `events` must carry `user_id` and event-time `ets` (watermark
    * source). Emits every input event tagged kept/rejected. */
  def enforce(events: DataFrame, maxPerWindow: Long,
              windowMs: Long = WindowMs,
              watermark: String = "1 hour"): Dataset[Quoted] = {
    implicit val stEnc = Encoders.product[Counter]
    implicit val outEnc = Encoders.product[Quoted]
    implicit val tupEnc = Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
    events
      .withWatermark("ets", watermark)
      .select(col("user_id"), col("ets"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[Counter, Quoted](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Counter]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.map(_._2.getTime).toSeq.sorted
            var st = state.getOption.getOrElse(Counter(-1L, 0L))
            val out = Seq.newBuilder[Quoted]
            sorted.foreach { ms =>
              val win = ms - ms % windowMs
              // never move the window backwards: stragglers from a prior
              // window bill the current one (see scaladoc)
              if (win > st.windowStartMs) st = Counter(win, 0L)
              st = st.copy(n = st.n + 1)
              out += Quoted(userId, ms, st.n <= maxPerWindow)
            }
            state.update(st)
            // evict once the watermark is past this window's end
            state.setTimeoutTimestamp(st.windowStartMs + windowMs + windowMs)
            out.result().iterator
          }
      }
  }
}
