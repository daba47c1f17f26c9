package graft.streaming

import graft.SparkSpec
import graft.sources.FakeKafkaSource
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterEach

/** The Kafka-SHAPED plan under real engine control: KafkaSourceConfig's
  * option map → the DataSourceV2 wire double (exact kafka output schema,
  * SupportsAdmissionControl rate limiting, checkpointed long offsets) →
  * EventParser → watermark → windowed aggregation. Everything here is
  * byte-compatible with `format("kafka")` — only the broker I/O is
  * faked (env-blocked jar; see FakeKafkaSource scaladoc). */
class KafkaPlanDoubleSpec extends SparkSpec with BeforeAndAfterEach {

  private val fmt = classOf[FakeKafkaSource].getName

  override protected def afterEach(): Unit = {
    FakeKafkaSource.clear()
    super.afterEach()
  }

  private def ev(id: Long, t: String, et: String, u: Long, v: Double): String =
    s"""{"event_id":$id,"ts":"$t","user_id":$u,"event_type":"$et","value":$v,"props":"{}"}"""

  test("wire double emits the kafka connector's exact schema") {
    FakeKafkaSource.publish("events.wire", Seq(ev(1, "2024-03-01T10:00:00Z", "view", 1, 1.0) -> 1L))
    val cfg = KafkaSourceConfig.Config("broker:9092", "events.wire", "earliest")
    val raw = KafkaSourceConfig.reader(spark, cfg, fmt).load()
    assert(raw.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq == Seq(
      "key" -> "binary", "value" -> "binary", "topic" -> "string",
      "partition" -> "int", "offset" -> "bigint",
      "timestamp" -> "timestamp", "timestampType" -> "int"))
  }

  test("subscribe -> parse -> watermark -> window plan delivers, with maxOffsetsPerTrigger honored per micro-batch") {
    val records = Seq(
      ev(1, "2024-03-01T10:10:00Z", "view", 1, 1.0),
      ev(2, "2024-03-01T10:20:00Z", "view", 2, 2.5),
      ev(3, "2024-03-01T10:40:00Z", "purchase", 1, 9.0),
      """{this is not json""", // poison pill: must quarantine, not kill the stream
      ev(5, "2024-03-01T11:10:00Z", "click", 2, 0.0),
      ev(6, "2024-03-01T11:20:00Z", "view", 3, 4.0),
      ev(7, "2024-03-01T12:40:00Z", "view", 1, 1.0),
      ev(8, "2024-03-01T12:50:00Z", "view", 2, 1.0)
    ).zipWithIndex.map { case (j, i) => j -> (1709287200000L + i * 1000L) }
    FakeKafkaSource.publish("events.wire", records)

    val cfg = KafkaSourceConfig.Config("broker:9092", "events.wire",
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(3))
    val raw = KafkaSourceConfig.reader(spark, cfg, fmt).load()
    val parsed = EventParser.valid(EventParser.parse(raw))
    val agg = WindowedAggPipeline.tumbling(parsed,
      watermark = "5 minutes", windowLen = "1 hour")

    val query = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("kafka_double_win")
      .start()
    try {
      query.processAllAvailable()
      // admission control: 8 records at maxOffsetsPerTrigger=3 must ride
      // >= 3 micro-batches, none above 3 input rows
      val batches = query.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3, s"expected >=3 rate-limited batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 3),
        s"a batch exceeded maxOffsetsPerTrigger: ${batches.map(_.numInputRows).mkString(",")}")

      val out = spark.table("kafka_double_win")
        .select("window_start", "event_type", "n", "total_value")
        .collect().map(r => (r.getTimestamp(0).toInstant.toString,
          r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      // the 7 valid events (poison pill dropped) roll up per (hour, type)
      assert(out.contains(("2024-03-01T10:00:00Z", "view", 2L, 3.5)))
      assert(out.contains(("2024-03-01T10:00:00Z", "purchase", 1L, 9.0)))
      assert(out.contains(("2024-03-01T11:00:00Z", "click", 1L, 0.0)))
      assert(out.contains(("2024-03-01T11:00:00Z", "view", 1L, 4.0)))
      assert(out.contains(("2024-03-01T12:00:00Z", "view", 2L, 2.0)))
    } finally query.stop()
  }

  test("startingOffsets=latest begins past the published log") {
    FakeKafkaSource.publish("events.tail", Seq(
      ev(1, "2024-03-01T10:10:00Z", "view", 1, 1.0) -> 1L,
      ev(2, "2024-03-01T10:20:00Z", "view", 2, 1.0) -> 2L))
    val cfg = KafkaSourceConfig.Config("broker:9092", "events.tail",
      startingOffsets = "latest")
    val raw = KafkaSourceConfig.reader(spark, cfg, fmt).load()
    val query = raw.select(col("offset")).writeStream
      .outputMode("append").format("memory").queryName("kafka_double_tail").start()
    try {
      query.processAllAvailable()
      assert(spark.table("kafka_double_tail").count() == 0L,
        "latest must skip the pre-existing log")
    } finally query.stop()
  }

  test("a config without subscribe is rejected before any batch runs") {
    val ex = intercept[Exception] {
      spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", "broker:9092")
        .load()
        .writeStream.format("memory").queryName("kafka_double_bad").start()
        .processAllAvailable()
    }
    assert(ex.getMessage != null)
  }
}
