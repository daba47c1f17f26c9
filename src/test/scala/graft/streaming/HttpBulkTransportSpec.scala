package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Wire-format + retry tests for [[HttpBulkTransport]] against an
  * in-process JDK HttpServer standing in for an ES node (no ES in this
  * image; the `_bulk` NDJSON contract is what's under test). */
class HttpBulkTransportSpec extends AnyFunSuite {

  /** Starts a one-endpoint server; `statusPlan` yields the HTTP status for
    * each successive request (last value repeats). Bodies are recorded. */
  private def withServer(statusPlan: Seq[Int])(f: (String, CopyOnWriteArrayList[String]) => Unit): Unit = {
    val bodies = new CopyOnWriteArrayList[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val it = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/_bulk", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        bodies.add(body)
        val i = math.min(it.getAndIncrement(), statusPlan.length - 1)
        val resp = "{\"errors\":false}".getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(statusPlan(i), resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", bodies)
    finally server.stop(0)
  }

  test("bulk body is action/source NDJSON with ids in the action metadata") {
    withServer(Seq(200)) { (url, bodies) =>
      val t = new HttpBulkTransport(url)
      t.bulkIndex("events", Seq("1" -> "{\"a\":1}", "2" -> "{\"b\":\"x\"}"))
      assert(bodies.size == 1)
      val lines = bodies.get(0).split("\n", -1)
      // 2 docs x 2 lines + trailing newline -> final empty segment
      assert(lines.length == 5 && lines(4).isEmpty)
      assert(lines(0) == "{\"index\":{\"_index\":\"events\",\"_id\":\"1\"}}")
      assert(lines(1) == "{\"a\":1}")
      assert(lines(2) == "{\"index\":{\"_index\":\"events\",\"_id\":\"2\"}}")
      assert(lines(3) == "{\"b\":\"x\"}")
    }
  }

  test("5xx responses retry with an identical (idempotent) payload") {
    withServer(Seq(503, 500, 200)) { (url, bodies) =>
      val t = new HttpBulkTransport(url, maxRetries = 3, retryBackoffMs = 1)
      t.bulkIndex("idx", Seq("k" -> "{\"v\":42}"))
      assert(bodies.size == 3)
      // every retry ships the same bytes; _id dedupe makes replays safe
      assert(bodies.asScala.toSet.size == 1)
    }
  }

  test("4xx is permanent: no retry, exception surfaces") {
    withServer(Seq(400)) { (url, bodies) =>
      val t = new HttpBulkTransport(url, maxRetries = 3, retryBackoffMs = 1)
      val e = intercept[java.io.IOException](t.bulkIndex("idx", Seq("k" -> "{}")))
      assert(e.getMessage.contains("400"))
      assert(bodies.size == 1)
    }
  }

  test("retries exhaust and the last failure surfaces") {
    withServer(Seq(500)) { (url, bodies) =>
      val t = new HttpBulkTransport(url, maxRetries = 2, retryBackoffMs = 1)
      intercept[java.io.IOException](t.bulkIndex("idx", Seq("k" -> "{}")))
      assert(bodies.size == 3) // initial + 2 retries
    }
  }

  test("plugs into ElasticsearchSink as the transport") {
    withServer(Seq(200)) { (url, bodies) =>
      val sink = new ElasticsearchSink("docs", "id", batchSize = 10, new HttpBulkTransport(url))
      assert(sink.open(0L, 0L))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))
      sink.process(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](7L, Double.NaN), schema))
      sink.close(null)
      assert(bodies.size == 1)
      assert(bodies.get(0).contains("{\"index\":{\"_index\":\"docs\",\"_id\":\"7\"}}"))
      // NaN serialized as null — valid JSON on the wire
      assert(bodies.get(0).contains("{\"id\":7,\"score\":null}"))
    }
  }
}
