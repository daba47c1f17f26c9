package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class LateDataAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  /** Listener events are delivered on the listener bus; poll briefly. */
  private def eventually[A](deadlineMs: Long = 10000L)(check: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    while (System.currentTimeMillis() < end) {
      if (check) return true
      Thread.sleep(50)
    }
    check
  }

  test("counts rows dropped past the watermark, none when on time") {
    implicit val sq = spark.sqlContext
    val audit = new LateDataAudit.Listener
    spark.streams.addListener(audit)
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ets", "user_id", "event_type", "value")
    val agg = WindowedAggPipeline.tumbling(events, watermark = "5 minutes", windowLen = "1 hour")
    val query = agg.writeStream.format("memory").queryName("lateaudit")
      .outputMode(OutputMode.Append()).start()
    try {
      // on-time data, then advance the watermark to ~02:25
      input.addData((ts("2024-01-01T00:05:00Z"), 1L, "view", 1.0))
      query.processAllAvailable()
      input.addData((ts("2024-01-01T02:30:00Z"), 2L, "view", 1.0))
      query.processAllAvailable()
      assert(audit.dropped("lateaudit") == 0L, "on-time rows must not count as late")

      // now a row hours older than the watermark: dropped + counted
      input.addData((ts("2024-01-01T00:01:00Z"), 3L, "view", 1.0))
      query.processAllAvailable()
      assert(eventually()(audit.dropped("lateaudit") == 1L),
        s"expected 1 watermark drop, saw ${audit.dropped("lateaudit")}")
      // the dropped row never reached the sink's 00:00 window
      val closed = spark.table("lateaudit").collect()
        .filter(r => r.getAs[Timestamp]("window_start").toInstant.toString == "2024-01-01T00:00:00Z")
      assert(closed.forall(_.getAs[Long]("n") == 1L))
      // and the watermark is being reported
      assert(eventually()(audit.watermark("lateaudit").isDefined))
    } finally {
      query.stop()
      spark.streams.removeListener(audit)
    }
  }
}
