package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("tumbling window aggregates a MemoryStream with watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ets", "user_id", "event_type", "value")
    val agg = WindowedAggPipeline.tumbling(events, watermark = "5 minutes", windowLen = "1 hour")

    val query = agg.writeStream
      .format("memory").queryName("winagg")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        (ts("2024-01-01T00:05:00Z"), 1L, "view", 1.0),
        (ts("2024-01-01T00:45:00Z"), 2L, "view", 2.0),
        (ts("2024-01-01T00:50:00Z"), 1L, "click", 3.0))
      query.processAllAvailable()
      // advance the watermark far enough to close the 00:00 window
      input.addData((ts("2024-01-01T02:30:00Z"), 3L, "view", 1.0))
      query.processAllAvailable()

      val rows = spark.table("winagg").collect()
      val views = rows.find(r => r.getAs[String]("event_type") == "view" &&
        r.getAs[Timestamp]("window_start").toInstant.toString == "2024-01-01T00:00:00Z")
      assert(views.isDefined, s"missing closed view window in ${rows.mkString(";")}")
      assert(views.get.getAs[Long]("n") == 2L)
      assert(views.get.getAs[Double]("total_value") == 3.0)
    } finally query.stop()
  }
}
