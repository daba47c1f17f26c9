package graft.streaming

import graft.SparkSpec

class KafkaSourceConfigSpec extends SparkSpec {
  test("builds the full kafka option map") {
    val opts = KafkaSourceConfig.options(KafkaSourceConfig.Config(
      bootstrapServers = "broker1:9092,broker2:9092",
      subscribe = "events",
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(500000L),
      groupIdPrefix = Some("graft")))
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "500000")
    assert(opts("failOnDataLoss") == "false")
    assert(opts("groupIdPrefix") == "graft")
  }

  test("optional options are omitted when unset") {
    val opts = KafkaSourceConfig.options(KafkaSourceConfig.Config("b:9092", "t"))
    assert(!opts.contains("maxOffsetsPerTrigger"))
    assert(!opts.contains("groupIdPrefix"))
    assert(opts("startingOffsets") == "earliest")
  }

  test("reader resolves the real kafka provider, or fails ONLY for its absence") {
    // This build image carries no spark-sql-kafka jar (zero egress;
    // /opt/spark/jars and the offline coursier cache were both checked),
    // so provider resolution is environment-conditional: on a cluster
    // with the connector the configured reader must resolve the source
    // (no broker contact happens at load() for option validation to
    // run); here, the ONLY acceptable failure is Spark's documented
    // missing-data-source error — any other exception means our option
    // map, not the environment, is broken.
    val reader = KafkaSourceConfig.reader(spark,
      KafkaSourceConfig.Config("broker1:9092", "events"))
    try {
      reader.load()
      succeed // connector present: the full source constructed
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("")
        assert(msg.contains("Failed to find data source: kafka") ||
          msg.contains("Failed to find the data source: kafka"),
          s"kafka load() failed for a reason other than the missing connector: $msg")
    }
  }
}
