package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class FileEventSourceSpec extends SparkSpec {

  /** FileStreamSource tails a DIRECTORY; stage the single-file table into
    * a temp drop dir the way a real deployment lands files. */
  private lazy val dropDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-drop")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events-000.parquet"))
    dir.toString
  }

  test("streams the events table from files through the windowed pipeline") {
    val events = FileEventSource.stream(spark, dropDir)
    val agg = WindowedAggPipeline.tumbling(events, watermark = "1 hour", windowLen = "1 hour")
    val query = agg.writeStream
      .format("memory").queryName("filewin")
      .outputMode(OutputMode.Complete()) // bounded replay: keep all windows
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      query.awaitTermination(120000)
      val rows = spark.table("filewin").collect()
      assert(rows.nonEmpty)
      // sf0.001 events span 2024-01-01..01-30 with 5 event types
      val types = rows.map(_.getAs[String]("event_type")).distinct.sorted
      assert(types.sameElements(Array("click", "error", "purchase", "signup", "view")))
      val total = rows.map(_.getAs[Long]("n")).sum
      assert(total == 1000L, s"expected all 1000 events aggregated, got $total")
      // epoch anchor: a unit error in the int64→ms decode (e.g. micros
      // div 1e6 = seconds → windows land in 1970) still aggregates to
      // 1000, so pin the actual window epochs to January 2024
      val starts = rows.map(
        _.getAs[java.sql.Timestamp]("window_start").toInstant.toEpochMilli)
      assert(starts.min == 1704067200000L, // 2024-01-01T00:00Z
        s"first hourly window drifted: ${starts.min}")
      assert(starts.max < 1706745600000L, // < 2024-02-01T00:00Z
        s"last hourly window drifted: ${starts.max}")
    } finally query.stop()
  }

  test("sliding windows emit overlapping buckets") {
    val events = FileEventSource.stream(spark, dropDir)
    val agg = WindowedAggPipeline.sliding(events, watermark = "1 hour",
      windowLen = "2 hours", slide = "1 hour")
    val query = agg.writeStream
      .format("memory").queryName("filesliding")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      query.awaitTermination(120000)
      val rows = spark.table("filesliding").collect()
      // each event lands in exactly 2 overlapping 2h/1h windows
      val total = rows.map(_.getAs[Long]("n")).sum
      assert(total == 2000L, s"each of 1000 events in 2 windows, got $total")
    } finally query.stop()
  }
}
