package graft.streaming

import graft.SparkSpec
import graft.streaming.BounceAlertStage.{Bounce, Ev}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Lambda parity for bounce detection: the streaming stage, replayed
  * over the real sf0.001 events and flushed (watermark advanced past
  * every open session's horizon by a sentinel event), must emit exactly
  * the batch e110 frame's per-entry-type bounce counts. */
class BounceParitySpec extends SparkSpec {
  import spark.implicits._

  private val SentinelUser = -1L

  test("streaming bounces over replayed + flushed sf0.001 events equal batch e110") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{col, timestamp_millis}

    val batch = graft.operators.Events
      .e110(spark, sf)
      .collect()
      .map(r => r.getAs[String]("entry_type") -> r.getAs[Long]("n_bounces"))
      .filter(_._2 > 0L).toMap

    val evs = graft.engine.Tables.events(spark, sf)
      .select("user_id", "event_id", "ms", "event_type").collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e.tsMs, e.eventId))
    val maxMs = evs.map(_.tsMs).max

    val input = MemoryStream[Ev]
    val events = input.toDS()
      .select(col("userId").as("user_id"), col("eventId").as("event_id"),
        timestamp_millis(col("tsMs")).as("ets"),
        col("eventType").as("event_type"))
    val query = BounceAlertStage.detect(events).writeStream
      .format("memory").queryName("parity_bounce")
      .outputMode(OutputMode.Append())
      .start()
    val streamed =
      try {
        val chunks = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq
        chunks.foreach { c => input.addData(c.toIndexedSeq); query.processAllAvailable() }
        // flush: a sentinel event far past every horizon (+10 days)
        // advances the watermark so every open session times out
        input.addData(Ev(SentinelUser, Long.MaxValue, maxMs + 10L * 86400000L, "view"))
        query.processAllAvailable()
        spark.table("parity_bounce").as[Bounce].collect()
          .filter(_.userId != SentinelUser)
      } finally query.stop()

    val rolled = streamed.groupBy(_.entryType)
      .map { case (t, bs) => t -> bs.length.toLong }
    assert(rolled == batch,
      s"streaming/batch bounce counts differ: streamed $rolled batch $batch")
  }
}
