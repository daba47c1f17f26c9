package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Kafka WIRE DOUBLE — a DataSourceV2 micro-batch source that speaks the
  * kafka connector's exact contract so the full subscribe → parse →
  * watermark → window plan is under test even though spark-sql-kafka is
  * not resolvable in this build image (zero-egress sandbox; see
  * KafkaSourceConfigSpec's env-block note).
  *
  * Faithful to the connector where a downstream plan could tell the
  * difference:
  *  - the OUTPUT SCHEMA is Kafka's seven columns byte-for-byte (key /
  *    value BINARY, topic STRING, partition INT, offset LONG, timestamp
  *    TIMESTAMP, timestampType INT) — a pipeline built on this double
  *    runs unchanged against `format("kafka")`;
  *  - it consumes KafkaSourceConfig's option map: `subscribe` picks the
  *    topic, `startingOffsets` earliest/latest picks the initial cursor,
  *    `maxOffsetsPerTrigger` becomes a ReadMaxRows admission limit (the
  *    same SupportsAdmissionControl hook the real connector uses), and
  *    `kafka.bootstrap.servers` is required-but-unused, exactly the
  *    field shape the real source validates first;
  *  - offsets are monotone longs checkpointed through the offset log
  *    (deserializeOffset round-trips), so restart/replay semantics are
  *    the engine's own, not faked.
  *
  * NOT faithful (and unneeded for plan tests): no real broker I/O —
  * records come from a process-local registry ([[FakeKafkaSource.publish]]),
  * which works because tests run local[*]; a multi-JVM cluster would
  * need the registry broadcast. TEST DOUBLE ONLY — production code paths
  * must keep using `format("kafka")`.
  */
class FakeKafkaSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-wire-double"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafkaSource.kafkaSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FakeKafkaTable(new CaseInsensitiveStringMap(properties))
}

object FakeKafkaSource {
  /** The kafka connector's exact output schema. */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** topic -> append-log of (value bytes, broker timestamp ms). */
  private val topics = TrieMap.empty[String, IndexedSeq[(Array[Byte], Long)]]

  /** Replace `topic`'s log with `records` (payload string, timestampMs). */
  def publish(topic: String, records: Seq[(String, Long)]): Unit =
    topics.put(topic, records.map { case (s, t) =>
      (s.getBytes(java.nio.charset.StandardCharsets.UTF_8), t)
    }.toIndexedSeq)

  def clear(): Unit = topics.clear()

  private[sources] def log(topic: String): IndexedSeq[(Array[Byte], Long)] =
    topics.getOrElse(topic, IndexedSeq.empty)
}

private[sources] class FakeKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"kafka-wire-double(${options.get("subscribe")})"
  override def schema(): StructType = FakeKafkaSource.kafkaSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeKafkaSource.kafkaSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FakeKafkaMicroBatchStream(options)
      }
    }
}

private[sources] case class FakeKafkaOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] case class FakeKafkaRange(topic: String, start: Long,
                                           end: Long, part: Int)
    extends InputPartition

private[sources] class FakeKafkaMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {
  // validate the exact fields KafkaSourceConfig.options emits, in the
  // same spirit as the real source's option validation
  require(options.containsKey("kafka.bootstrap.servers"),
    "missing option kafka.bootstrap.servers")
  private val topic: String = {
    val t = options.get("subscribe")
    require(t != null && t.nonEmpty, "missing option subscribe")
    t
  }
  private val starting: String = options.getOrDefault("startingOffsets", "latest")
  require(starting == "earliest" || starting == "latest",
    s"startingOffsets must be earliest|latest, got $starting")
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)

  private def size(): Long = FakeKafkaSource.log(topic).size.toLong

  override def initialOffset(): Offset =
    FakeKafkaOffset(if (starting == "earliest") 0L else size())

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control variant is used (SupportsAdmissionControl)")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[FakeKafkaOffset].n
    val cap = limit match {
      case m: ReadMaxRows => s + m.maxRows()
      case _ => Long.MaxValue
    }
    FakeKafkaOffset(math.min(size(), cap))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeKafkaOffset].n
    val e = end.asInstanceOf[FakeKafkaOffset].n
    if (e <= s) Array.empty
    else {
      // two splits so downstream parallelism is exercised like a
      // multi-partition topic would
      val mid = s + (e - s) / 2
      Array[InputPartition](
        FakeKafkaRange(topic, s, mid, 0), FakeKafkaRange(topic, mid, e, 1))
        .filter { case r: FakeKafkaRange => r.end > r.start }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FakeKafkaReaderFactory

  override def deserializeOffset(json: String): Offset =
    FakeKafkaOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] object FakeKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rng = partition.asInstanceOf[FakeKafkaRange]
      private val data = FakeKafkaSource.log(rng.topic)
      private var i: Long = rng.start - 1
      override def next(): Boolean = { i += 1; i < rng.end }
      override def get(): InternalRow = {
        val (bytes, tsMs) = data(i.toInt)
        InternalRow(
          null, // key: nullable, like an unkeyed producer
          bytes,
          UTF8String.fromString(rng.topic),
          rng.part,
          i,
          tsMs * 1000L, // micros
          0) // TimestampType.CREATE_TIME
      }
      override def close(): Unit = ()
    }
}
