package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ElasticsearchSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def row(id: Long, t: String, v: Double): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](id, t, v), schema)

  test("batches bulks at batchSize and flushes the tail on close") {
    InMemoryTransport.reset()
    val sink = new ElasticsearchSink("events", "id", batchSize = 2, InMemoryTransport)
    assert(sink.open(0L, 0L))
    (1L to 5L).foreach(i => sink.process(row(i, "view", i * 1.5)))
    sink.close(null)
    assert(InMemoryTransport.bulkCount.get() == 3) // 2 + 2 + tail(1)
    val docs = InMemoryTransport.indexed("events")
    assert(docs.size == 5)
    assert(docs("3") == """{"id":3,"event_type":"view","value":4.5}""")
  }

  test("re-delivery of the same rows is idempotent by doc id") {
    InMemoryTransport.reset()
    val sink = new ElasticsearchSink("idx", "id", batchSize = 10, InMemoryTransport)
    sink.open(0L, 0L); sink.process(row(1L, "a", 1.0)); sink.close(null)
    val sink2 = new ElasticsearchSink("idx", "id", batchSize = 10, InMemoryTransport)
    sink2.open(0L, 1L); sink2.process(row(1L, "a", 1.0)); sink2.close(null)
    assert(InMemoryTransport.indexed("idx").size == 1)
  }

  test("JSON escaping handles quotes and control chars") {
    InMemoryTransport.reset()
    val sink = new ElasticsearchSink("esc", "id", batchSize = 10, InMemoryTransport)
    sink.open(0L, 0L)
    sink.process(row(1L, "he said \"hi\"\nback\tslash\\", 0.0))
    sink.close(null)
    val json = InMemoryTransport.indexed("esc")("1")
    assert(json.contains("""he said \"hi\"\nback\tslash\\"""))
  }

  test("sink works end-to-end under foreach in a real write") {
    import spark.implicits._
    InMemoryTransport.reset()
    val df = Seq((10L, "view", 1.0), (11L, "click", 2.0)).toDF("id", "event_type", "value")
    // foreachPartition exercises the same executor-side writer lifecycle
    // (open/process/close per partition) as writeStream.foreach
    df.repartition(2).foreachPartition { (it: Iterator[Row]) =>
      val w = new ElasticsearchSink("e2e", "id", 100, InMemoryTransport)
      w.open(0L, 0L)
      it.foreach(w.process)
      w.close(null)
    }
    assert(InMemoryTransport.indexed("e2e").size == 2)
  }
}
