package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader

/** Kafka readStream option builder — the ingestion edge of the KSE
  * (Kafka -> Spark -> Elasticsearch) pipeline.
  *
  * The kafka connector jar is not present in this build image, so
  * `reader` wires a fully-configured DataStreamReader without starting it;
  * option construction (the part that is ours) is unit-tested
  * structurally. On a real cluster `load()` just works once
  * spark-sql-kafka is on the classpath.
  */
object KafkaSourceConfig {
  final case class Config(
      bootstrapServers: String,
      subscribe: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false,
      groupIdPrefix: Option[String] = None)

  /** The exact option map `spark.readStream.format("kafka")` expects. */
  def options(c: Config): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> c.bootstrapServers,
      "subscribe" -> c.subscribe,
      "startingOffsets" -> c.startingOffsets,
      "failOnDataLoss" -> c.failOnDataLoss.toString)
    base ++
      c.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      c.groupIdPrefix.map("groupIdPrefix" -> _)
  }

  /** `format` defaults to the real connector; tests pass
    * `classOf[graft.sources.FakeKafkaSource].getName` to run the SAME
    * subscribe→parse→watermark plan against the wire double (the kafka
    * jar is env-blocked in this image — see FakeKafkaSource). */
  def reader(spark: SparkSession, c: Config,
             format: String = "kafka"): DataStreamReader =
    spark.readStream.format(format).options(options(c))
}
