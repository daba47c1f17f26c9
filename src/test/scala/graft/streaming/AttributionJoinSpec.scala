package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class AttributionJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("purchases join preceding views within the window; stale views don't match") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = AttributionJoin.attribute(
      views.toDF().toDF("user_id", "ets", "event_id"),
      purchases.toDF().toDF("user_id", "ets", "event_id", "value"),
      watermark = "5 minutes", window = "1 hour")
    val query = out.writeStream
      .format("memory").queryName("attributed")
      .outputMode(OutputMode.Append())
      .start()
    try {
      views.addData(
        (1L, ts("2024-01-01T00:10:00Z"), 100L), // in-window for the purchase
        (1L, ts("2024-01-01T02:30:00Z"), 101L), // AFTER the purchase
        (2L, ts("2024-01-01T00:00:00Z"), 102L)) // >1h before user-2 purchase
      purchases.addData(
        (1L, ts("2024-01-01T00:40:00Z"), 200L, 9.99),
        (2L, ts("2024-01-01T01:30:00Z"), 201L, 5.00))
      query.processAllAvailable()
      val rows = spark.table("attributed").collect()
      assert(rows.length == 1, s"expected exactly one attribution, got ${rows.mkString(";")}")
      val r = rows.head
      assert(r.getAs[Long]("purchase_id") == 200L && r.getAs[Long]("view_id") == 100L)
    } finally query.stop()
  }
}
