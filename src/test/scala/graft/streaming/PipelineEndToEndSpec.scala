package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.SparkSpec
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** The full KSE pipeline shape, wire-complete: stream source (Kafka
  * stand-in: MemoryStream of key/value like the connector's output) →
  * JSON parse → windowed aggregate → ForeachWriter ES sink →
  * HttpBulkTransport → an in-process HTTP "_bulk" endpoint. Asserts what
  * actually arrived over HTTP, not an in-memory shortcut. */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny ES stand-in: parses NDJSON bulks, upserts docs by _id. */
  private def withEsStub(f: (String, ConcurrentHashMap[String, String]) => Unit): Unit = {
    val docs = new ConcurrentHashMap[String, String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val lines = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
        lines.grouped(2).foreach { case Array(action, source) =>
          val id = action.split("\"_id\":\"")(1).takeWhile(_ != '"')
          docs.put(id, source)
        }
        val resp = "{\"errors\":false}".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", docs)
    finally server.stop(0)
  }

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("source -> parse -> window agg -> ES sink delivers closed windows over HTTP") {
    withEsStub { (url, docs) =>
      implicit val sq = spark.sqlContext
      // the kafka connector's (value) payload shape, as JSON strings
      val input = MemoryStream[String]
      val parsed = EventParser.parse(input.toDF().toDF("value"))
      val agg = WindowedAggPipeline.tumbling(parsed, watermark = "5 minutes", windowLen = "1 hour")
        .withColumn("doc_id",
          org.apache.spark.sql.functions.concat_ws("_",
            org.apache.spark.sql.functions.col("event_type"),
            org.apache.spark.sql.functions.unix_timestamp(
              org.apache.spark.sql.functions.col("window_start"))))
      val sink = new ElasticsearchSink("win", "doc_id", batchSize = 100,
        new HttpBulkTransport(url, maxRetries = 2, retryBackoffMs = 1))
      val query = agg.writeStream
        .outputMode("append")
        .foreach(sink)
        .start()
      try {
        def ev(id: Long, t: String, et: String, u: Long, v: Double): String =
          s"""{"event_id":$id,"ts":"$t","user_id":$u,"event_type":"$et","value":$v,"props":"{}"}"""
        input.addData(
          ev(1, "2024-03-01T10:10:00Z", "view", 1, 1.0),
          ev(2, "2024-03-01T10:20:00Z", "view", 2, 2.5),
          ev(3, "2024-03-01T10:40:00Z", "purchase", 1, 9.0))
        query.processAllAvailable()
        // advance the watermark past 11:05 so the 10:00 window closes
        input.addData(ev(4, "2024-03-01T12:00:00Z", "view", 3, 0.5))
        query.processAllAvailable()

        val arrived = docs.asScala
        assert(arrived.contains("view_1709287200"),
          s"expected closed 10:00 view window among ${arrived.keys.mkString(",")}")
        val viewDoc = arrived("view_1709287200")
        assert(viewDoc.contains("\"n\":2"))
        assert(viewDoc.contains("\"total_value\":3.5"))
        assert(arrived.contains("purchase_1709287200"))
      } finally query.stop()
    }
  }
}
