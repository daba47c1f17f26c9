package graft.streaming

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** [[BulkTransport]] over Elasticsearch's low-level REST `_bulk` API —
  * plain HTTP, no client library (none in this image; the wire format is
  * public and stable).
  *
  * Each bulk POST body is NDJSON: an `{"index":{...}}` action line, then
  * the document source line, repeated, with a trailing newline (ES
  * requires it). Document ids ride in the action metadata, so re-delivery
  * of the same bulk is an idempotent upsert on the ES side — which is what
  * makes the retry loop below safe.
  *
  * Retries: transient failures (IOException, 5xx) back off linearly and
  * retry up to `maxRetries`; 4xx responses are permanent and throw
  * immediately (retrying a rejected payload can't succeed).
  */
class HttpBulkTransport(baseUrl: String, maxRetries: Int = 3,
                        retryBackoffMs: Long = 50) extends BulkTransport {

  override def bulkIndex(index: String, docs: Seq[(String, String)]): Unit = {
    if (docs.isEmpty) return
    val payload = HttpBulkTransport.ndjson(index, docs)
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val code =
        try Some(post(payload))
        catch { case _: IOException if attempt <= maxRetries => None } // transport error: retry
      code match {
        case Some(c) if c / 100 == 2 => done = true
        case Some(c) if c / 100 == 4 =>
          throw new IOException(s"_bulk returned HTTP $c — permanent, not retrying")
        case Some(c) if attempt <= maxRetries => backoff(attempt) // 5xx: transient
        case Some(c) =>
          throw new IOException(s"_bulk returned HTTP $c after $attempt attempts")
        case None => backoff(attempt)
      }
    }
  }

  private def backoff(attempt: Int): Unit = Thread.sleep(retryBackoffMs * attempt)

  private def post(body: Array[Byte]): Int = {
    val conn = URI.create(s"$baseUrl/_bulk").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/x-ndjson")
      conn.setDoOutput(true)
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(30000)
      val out = conn.getOutputStream
      try { out.write(body) } finally out.close()
      conn.getResponseCode
    } finally conn.disconnect()
  }
}

object HttpBulkTransport {
  /** The `_bulk` NDJSON body: action+source line pairs, trailing newline. */
  def ndjson(index: String, docs: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    docs.foreach { case (id, json) =>
      sb.append("{\"index\":{\"_index\":").append(quote(index))
        .append(",\"_id\":").append(quote(id)).append("}}\n")
      sb.append(json).append('\n')
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
