package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Seasonal-naive deviation tracking — the streaming twin of the e115
  * baseline: every closed traffic hour is compared against the SAME hour
  * one week earlier (the 168-hour lag), emitting the volume pair and the
  * absolute deviation in ppm. The live capacity sentinel: "this Monday
  * 9am is 40% off last Monday 9am" the moment the hour closes.
  *
  * State is keyed by HOUR-OF-WEEK (0..167), so the key space is 168 by
  * construction — per key four longs: the open hour's (hour, running
  * count) and the last closed hour's (hour, count), which IS the
  * previous-week value when the next hour of that key arrives (same key
  * ⇒ exactly 168 h apart). An hour closes when a later hour of its key
  * arrives in-stream, or via event-time timeout at the hour's end once
  * the watermark passes it; a closed-without-successor hour is retained
  * as `prev` until one week + one hour past its start, then evicted —
  * total state is ≤ 168 × 4 longs at ANY traffic volume.
  *
  * Deviation is emitted only when the previous-week hour actually had
  * traffic (prev hour == hour − 168), matching the batch left join on
  * the exact lag; late events older than the open hour are dropped
  * (counting them against an already-emitted hour would double-fire).
  */
object SeasonalDeviationStage {
  final case class HwState(openHour: Long, openN: Long, prevHour: Long, prevN: Long)
  final case class Deviation(absHour: Long, hourOfWeek: Long, n: Long,
                             nPrev: Option[Long], devPpm: Option[Long])

  private val HourMs = 3600000L

  private def closedRow(st: HwState): Deviation = {
    val prev = if (st.prevHour == st.openHour - 168) Some(st.prevN) else None
    val dev = prev.map(p => math.abs(st.openN - p) * 1000000L / p)
    Deviation(st.openHour, java.lang.Math.floorMod(st.openHour, 168L),
      st.openN, prev, dev)
  }

  /** `events` must carry an `ets` timestamp column (watermark source). */
  def detect(events: DataFrame, watermark: String = "2 hours"): Dataset[Deviation] = {
    implicit val stEnc = Encoders.product[HwState]
    implicit val outEnc = Encoders.product[Deviation]
    implicit val tsEnc = Encoders.TIMESTAMP
    events
      .withWatermark("ets", watermark)
      .select(col("ets"))
      .as[java.sql.Timestamp]
      .groupByKey(ts => java.lang.Math.floorMod(
        java.lang.Math.floorDiv(ts.getTime, HourMs), 168L))(Encoders.scalaLong)
      .flatMapGroupsWithState[HwState, Deviation](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, evs: Iterator[java.sql.Timestamp], state: GroupState[HwState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            if (st.openHour >= 0) {
              // close the open hour (no in-stream successor yet); keep it
              // as `prev` so next week's hour can still compare, with an
              // eviction horizon one week + one hour out
              val out = closedRow(st)
              state.update(HwState(-1L, 0L, st.openHour, st.openN))
              state.setTimeoutTimestamp(math.max(
                (st.openHour + 169) * HourMs, state.getCurrentWatermarkMs + 1))
              Iterator(out)
            } else {
              // retained prev never got its next-week hour — evict
              state.remove()
              Iterator.empty
            }
          } else {
            val counts = evs.map(ts => java.lang.Math.floorDiv(ts.getTime, HourMs))
              .toSeq.groupBy(identity).toSeq.sortBy(_._1)
              .map { case (h, xs) => (h, xs.size.toLong) }
            var st = state.getOption.getOrElse(HwState(-1L, 0L, Long.MinValue, 0L))
            val out = Seq.newBuilder[Deviation]
            counts.foreach { case (h, c) =>
              if (h == st.openHour) st = st.copy(openN = st.openN + c)
              else if (h > st.openHour) {
                if (st.openHour >= 0) {
                  out += closedRow(st)
                  st = HwState(h, c, st.openHour, st.openN)
                } else {
                  st = HwState(h, c, st.prevHour, st.prevN) // keep timeout-closed prev
                }
              } // else: late beyond the open hour — dropped
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              (st.openHour + 1) * HourMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }

  /** Deviations at or above an alert threshold (ppm), previous week known. */
  def alerts(events: DataFrame, thresholdPpm: Long = 400000L,
             watermark: String = "2 hours"): Dataset[Deviation] =
    detect(events, watermark).filter(_.devPpm.exists(_ >= thresholdPpm))
}
