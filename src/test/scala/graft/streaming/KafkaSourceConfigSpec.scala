package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class KafkaSourceConfigSpec extends AnyFunSuite {
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
}
