package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class DedupStageSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("re-delivered events are dropped within the watermark horizon") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ets", "event_type")
    val query = DedupStage.exactOnce(events, "event_id", watermark = "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, ts("2024-01-01T00:00:00Z"), "view"),
                    (2L, ts("2024-01-01T00:01:00Z"), "click"))
      query.processAllAvailable()
      // batch 2 re-delivers event 1 (at-least-once source) + a new event
      input.addData((1L, ts("2024-01-01T00:00:00Z"), "view"),
                    (3L, ts("2024-01-01T00:02:00Z"), "purchase"))
      query.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
    } finally query.stop()
  }

  test("content-hash dedup drops byte-identical payloads") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ets", "payload")
    val query = DedupStage.byContent(events, Seq("event_id", "payload"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedupedc")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, ts("2024-01-01T00:00:00Z"), "x"),
                    (1L, ts("2024-01-01T00:00:00Z"), "x"), // dup within batch
                    (1L, ts("2024-01-01T00:00:00Z"), "y")) // same id, new content
      query.processAllAvailable()
      assert(spark.table("dedupedc").count() == 2)
    } finally query.stop()
  }
}
