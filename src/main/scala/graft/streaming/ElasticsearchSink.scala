package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Elasticsearch bulk-index sink — the delivery edge of the KSE pipeline.
  *
  * The transport is pluggable ([[BulkTransport]]): no ES client exists in
  * this image, so tests inject [[InMemoryTransport]]. Everything else —
  * per-partition writer lifecycle, JSON doc serialization, bulk batching,
  * flush-on-close — is the real production shape of a ForeachWriter sink.
  */
trait BulkTransport extends Serializable {
  /** Deliver one bulk of JSON docs to `index`. Must be idempotent per
    * (index, docId) for exactly-once delivery on retries. */
  def bulkIndex(index: String, docs: Seq[(String, String)]): Unit
}

/** Test/local transport: collects bulks into a process-wide map keyed by
  * index name (ConcurrentHashMap — ForeachWriter instances run on executor
  * threads). Idempotent by docId, like a real ES upsert. */
object InMemoryTransport extends BulkTransport {
  val stores = new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
  val bulkCount = new java.util.concurrent.atomic.AtomicInteger(0)

  override def bulkIndex(index: String, docs: Seq[(String, String)]): Unit = {
    bulkCount.incrementAndGet()
    val store = stores.computeIfAbsent(index, _ => new ConcurrentHashMap[String, String]())
    docs.foreach { case (id, json) => store.put(id, json) }
  }

  def indexed(index: String): Map[String, String] =
    Option(stores.get(index)).map(_.asScala.toMap).getOrElse(Map.empty)
  def reset(): Unit = { stores.clear(); bulkCount.set(0) }
}

/** ForeachWriter that serializes rows to JSON docs and ships them in
  * bulks of `batchSize` (ES bulk API pattern: bound request size, flush
  * the tail on close). `idColumn` is the ES _id → idempotent re-delivery. */
class ElasticsearchSink(index: String, idColumn: String, batchSize: Int,
                        transport: BulkTransport) extends ForeachWriter[Row] {
  private var buf: ArrayBuffer[(String, String)] = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    buf = new ArrayBuffer[(String, String)](batchSize)
    true
  }

  override def process(row: Row): Unit = {
    buf += ((row.getAs[Any](idColumn).toString, rowToJson(row)))
    if (buf.length >= batchSize) flush()
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (errorOrNull == null && buf != null && buf.nonEmpty) flush()
    buf = null
  }

  private def flush(): Unit = {
    transport.bulkIndex(index, buf.toSeq)
    buf.clear()
  }

  /** Minimal JSON doc serialization (strings escaped, numerics raw).
    * NaN/Infinity are not valid JSON — ES's bulk endpoint rejects them —
    * so non-finite floats serialize as null. Arrays and nested structs
    * recurse (ES maps them to array / object fields); maps and binary are
    * rejected loudly rather than emitted as their toString. */
  private def rowToJson(row: Row): String = {
    val fields = row.schema.fields.zipWithIndex.map { case (f, i) =>
      "\"" + f.name + "\":" + valueToJson(row.get(i))
    }
    fields.mkString("{", ",", "}")
  }

  private def jsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def valueToJson(v: Any): String = v match {
    case null => "null"
    case s: String => jsonEscape(s)
    case d: Double => if (java.lang.Double.isFinite(d)) d.toString else "null"
    case fl: Float => if (java.lang.Float.isFinite(fl)) fl.toString else "null"
    case b: Boolean => b.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: BigDecimal => bd.underlying.toPlainString
    case ts: java.sql.Timestamp => "\"" + ts.toInstant.toString + "\""
    case dt: java.sql.Date => "\"" + dt.toString + "\""
    case seq: scala.collection.Seq[_] => seq.map(valueToJson).mkString("[", ",", "]")
    case arr: Array[_] => arr.map(valueToJson).mkString("[", ",", "]")
    case r: Row =>
      r.schema.fields.zipWithIndex
        .map { case (f, i) => "\"" + f.name + "\":" + valueToJson(r.get(i)) }
        .mkString("{", ",", "}")
    case other => throw new IllegalArgumentException(
      s"ElasticsearchSink cannot serialize ${other.getClass.getName} — " +
        "project the column to a supported type before the sink")
  }
}
