package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.{concat_ws, col}
import graft.streaming._

/** End-to-end demo of the KSE pipeline re-expressed Spark-first:
  * (kafka-shaped) JSON byte stream -> EventParser -> watermarked windowed
  * aggregation -> Elasticsearch bulk sink (stub transport).
  * Run: sbt "runMain graft.tools.PipelineDemo"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // stand-in for the kafka source (same `value` wire format)
    val wire = MemoryStream[String]
    val parsed = EventParser.valid(EventParser.parse(wire.toDF().toDF("value")))
    // composite doc id: one ES doc per (window, event_type) — keying on
    // window_start alone would collide different event types of the hour
    val windowed = WindowedAggPipeline.tumbling(parsed, watermark = "5 minutes", windowLen = "1 hour")
      .withColumn("doc_key", concat_ws("|", col("window_start"), col("event_type")))

    InMemoryTransport.reset()
    val query = windowed.writeStream
      .outputMode(OutputMode.Append())
      .foreach(new ElasticsearchSink("events_hourly", "doc_key", 100, InMemoryTransport))
      .start()

    def ev(id: Long, ts: String, user: Long, t: String, v: Double): String =
      s"""{"event_id": $id, "ts": "$ts", "user_id": $user, "event_type": "$t", "value": $v, "props": "{}"}"""

    wire.addData(
      ev(1, "2024-01-01T00:05:00Z", 1, "view", 1.0),
      ev(2, "2024-01-01T00:45:00Z", 2, "view", 2.0),
      ev(3, "2024-01-01T00:50:00Z", 1, "click", 3.0),
      "{corrupt json!!",
      ev(4, "2024-01-01T01:10:00Z", 3, "purchase", 9.0))
    query.processAllAvailable()
    wire.addData(ev(5, "2024-01-01T03:00:00Z", 1, "view", 1.0)) // advance watermark
    query.processAllAvailable()
    query.stop()

    println("=== indexed hourly buckets (ES stub) ===")
    InMemoryTransport.indexed("events_hourly").toSeq.sortBy(_._2).foreach {
      case (id, json) => println(s"$id -> $json")
    }

    // file-replay path: same windowed pipeline fed from a drop directory
    val drop = java.nio.file.Files.createTempDirectory("events-drop")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      drop.resolve("events-000.parquet"))
    val replay = WindowedAggPipeline.tumbling(
      FileEventSource.stream(spark, drop.toString), watermark = "1 hour")
    val replayQ = replay.writeStream
      .format("memory").queryName("replay")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    replayQ.awaitTermination(120000)
    replayQ.stop()
    val n = spark.table("replay").agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    println(s"=== file replay: $n events re-aggregated over " +
      s"${spark.table("replay").count()} hourly buckets ===")

    // stream-stream attribution: purchases joined to preceding views
    val wire2 = MemoryStream[String]
    val parsed2 = EventParser.valid(EventParser.parse(wire2.toDF().toDF("value")))
    val attributed = AttributionJoin.attribute(
      parsed2.filter(col("event_type") === "view"),
      parsed2.filter(col("event_type") === "purchase"),
      watermark = "5 minutes", window = "1 hour")
    val attrQ = attributed.writeStream
      .format("memory").queryName("attr").outputMode(OutputMode.Append()).start()
    wire2.addData(
      ev(10, "2024-01-01T00:10:00Z", 1, "view", 0.0),
      ev(11, "2024-01-01T00:40:00Z", 1, "purchase", 19.99),
      ev(12, "2024-01-01T03:00:00Z", 2, "purchase", 5.0)) // no prior view
    attrQ.processAllAvailable()
    attrQ.stop()
    println("=== attributed purchases (purchase_id <- view_id) ===")
    spark.table("attr").select("purchase_id", "view_id", "value").show()
    spark.stop()
  }
}
