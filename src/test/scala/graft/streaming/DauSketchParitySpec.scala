package graft.streaming

import graft.SparkSpec
import graft.streaming.DauSketchStage.UEv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Lambda parity for the DAU sketch: the streaming daily HLL++ estimate
  * replayed over the real sf0.001 events table must equal the batch e101
  * audit's approx_dau BIT-EXACTLY per day. HLL++ merges registers by max,
  * so the estimate is independent of arrival order and micro-batch
  * boundaries — the property that lets a backfill job and the live stream
  * share one DAU definition. The replay deliberately splits the events
  * into two unordered batches to exercise cross-batch register merging. */
class DauSketchParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming daily DAU sketch over replayed sf0.001 events equals batch e101") {
    implicit val sq = spark.sqlContext

    val batch = graft.operators.Events.e101(spark, sf)
      .select("day", "approx_dau").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val evs = graft.engine.Tables.events(spark, sf)
      .select("user_id", "ms").collect()
      .map(r => UEv(r.getLong(0), r.getLong(1)))
    // two arrival batches, neither time-ordered: parity must survive both
    val (first, second) = evs.zipWithIndex.partition(_._2 % 2 == 0)

    val input = MemoryStream[UEv]
    val stream = DauSketchStage.dailyDau(
      input.toDS()
        .select(col("userId").as("user_id"),
                timestamp_millis(col("tsMs")).as("ets")))
    // Complete mode: the spec wants every window's final value without a
    // watermark-flush sentinel; production uses Append + the watermark.
    val query = stream.writeStream
      .format("memory").queryName("parity_dau")
      .outputMode(OutputMode.Complete())
      .start()
    val streamed =
      try {
        input.addData(first.map(_._1).toIndexedSeq)
        query.processAllAvailable()
        input.addData(second.map(_._1).toIndexedSeq)
        query.processAllAvailable()
        spark.table("parity_dau").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      } finally query.stop()

    assert(streamed.size == batch.size,
      s"day count: streaming ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch, "streaming/batch DAU sketch values differ")
  }

  test("streaming KMV DAU (custom TypedImperativeAggregate in streaming state) equals batch e103") {
    implicit val sq = spark.sqlContext

    val batch = graft.operators.Events.e103(spark, sf)
      .select("day", "n_kept", "est_distinct").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSeq.sorted

    val evs = graft.engine.Tables.events(spark, sf)
      .select("user_id", "ms").collect()
      .map(r => UEv(r.getLong(0), r.getLong(1)))
    val (first, second) = evs.zipWithIndex.partition(_._2 % 3 == 0)

    val input = MemoryStream[UEv]
    val stream = DauSketchStage.dailyDauKmv(
      input.toDS()
        .select(col("userId").as("user_id"),
                timestamp_millis(col("tsMs")).as("ets")))
    val query = stream.writeStream
      .format("memory").queryName("parity_kmv")
      .outputMode(OutputMode.Complete())
      .start()
    val streamed =
      try {
        input.addData(first.map(_._1).toIndexedSeq)
        query.processAllAvailable()
        input.addData(second.map(_._1).toIndexedSeq)
        query.processAllAvailable()
        spark.table("parity_kmv").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            math.rint(r.getDouble(2) * 1e6) / 1e6)).toSeq.sorted
      } finally query.stop()

    assert(streamed.size == batch.size,
      s"day count: streaming ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch,
      "streaming KMV buffer did not survive state-store round-trips bit-exactly")
  }
}
