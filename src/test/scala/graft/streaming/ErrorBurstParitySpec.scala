package graft.streaming

import graft.SparkSpec
import graft.streaming.ErrorBurstStage.{Burst, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Lambda parity for error-burst detection: the streaming stage,
  * replayed over the real sf0.001 error events, must report the same
  * per-user MAX trailing-5-min burst as the batch e97 frame — one
  * definition of "burst" for the live alert and the nightly sweep. */
class ErrorBurstParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming bursts over replayed sf0.001 errors equal batch e97's per-user max") {
    implicit val sq = spark.sqlContext

    val batch = graft.operators.Events
      .errorBurstFrame(graft.engine.Tables.events(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted

    val evs = graft.engine.Tables.events(spark, sf)
      .filter("event_type = 'error'")
      .select("user_id", "ms").collect()
      .map(r => Ev(r.getLong(0), r.getLong(1)))
      .sortBy(_.tsMs)

    val input = MemoryStream[Ev]
    val query = ErrorBurstStage.detectUnbounded(input.toDS()).writeStream
      .format("memory").queryName("parity_burst")
      .outputMode(OutputMode.Append())
      .start()
    val streamed =
      try {
        // replay in two arrival chunks to prove state carries across batches
        val (a, b) = evs.splitAt(evs.length / 2)
        input.addData(a.toIndexedSeq)
        query.processAllAvailable()
        input.addData(b.toIndexedSeq)
        query.processAllAvailable()
        spark.table("parity_burst").as[Burst].collect()
      } finally query.stop()

    val rolled = streamed.groupBy(_.userId).map { case (u, bs) =>
      (u, bs.map(_.count).max)
    }.toSeq.sorted

    assert(rolled == batch, "streaming/batch burst frames differ")
  }

  test("window prune, threshold filter, and late-drop semantics") {
    implicit val sq = spark.sqlContext
    val m = 60000L
    val input = MemoryStream[Ev]
    val query = ErrorBurstStage.detectUnbounded(input.toDS()).writeStream
      .format("memory").queryName("burst_sem")
      .outputMode(OutputMode.Append())
      .start()
    val streamed =
      try {
        // three errors inside 5 min, then one 6 min later (window resets
        // to the pair still in range), then a LATE event that must drop
        input.addData(Ev(1L, 10 * m), Ev(1L, 12 * m), Ev(1L, 14 * m))
        query.processAllAvailable()
        input.addData(Ev(1L, 20 * m)) // 6 min after 14m: only 20m in window...
        query.processAllAvailable()
        input.addData(Ev(1L, 11 * m)) // late: older than newest stored (20m)
        query.processAllAvailable()
        spark.table("burst_sem").as[Burst].collect().toSeq.sortBy(_.tsMs)
      } finally query.stop()
    assert(streamed == Seq(
      Burst(1L, 10 * m, 1L), Burst(1L, 12 * m, 2L), Burst(1L, 14 * m, 3L),
      Burst(1L, 20 * m, 1L)), s"got $streamed")
  }

  test("default detect (event-time eviction) matches detectUnbounded on on-time data and evicts idle state") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val m = 60000L
    val input = MemoryStream[Ev]
    val events = input.toDS()
      .select(col("userId").as("user_id"),
        timestamp_millis(col("tsMs")).as("ets"))
    val query = ErrorBurstStage.detect(events).writeStream
      .format("memory").queryName("burst_evict")
      .outputMode(OutputMode.Append())
      .start()
    def stateRows: Long =
      query.lastProgress.stateOperators(0).numRowsTotal
    val streamed =
      try {
        input.addData(Ev(1L, 10 * m), Ev(1L, 12 * m))
        query.processAllAvailable()
        assert(stateRows == 1L, s"user 1 live: $stateRows")
        // u2@60m advances the watermark to 50m; user 1's horizon was
        // 12m + 5m = 17m < 50m, so the follow-up micro-batch
        // processAllAvailable drains fires their timeout — state holds
        // ONLY u2 afterwards (u1's row evicted, proven by the count
        // staying 1 while u2's burst output below proves u2 is live)
        input.addData(Ev(2L, 60 * m))
        query.processAllAvailable()
        assert(stateRows == 1L, s"idle user 1 not evicted: $stateRows")
        // u2's state survived the eviction sweep: its count continues
        input.addData(Ev(2L, 61 * m))
        query.processAllAvailable()
        assert(stateRows == 1L, s"unexpected state rows: $stateRows")
        spark.table("burst_evict").as[Burst].collect().toSeq
          .sortBy(b => (b.userId, b.tsMs))
      } finally query.stop()
    // burst counts identical to the NoTimeout path on this on-time replay
    assert(streamed == Seq(
      Burst(1L, 10 * m, 1L), Burst(1L, 12 * m, 2L),
      Burst(2L, 60 * m, 1L), Burst(2L, 61 * m, 2L)), s"got $streamed")
  }
}
