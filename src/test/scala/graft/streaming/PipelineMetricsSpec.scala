package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class PipelineMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observe metrics accumulate across micro-batches without a second pass") {
    implicit val sq = spark.sqlContext
    val acc = new PipelineMetrics.Accumulator
    spark.streams.addListener(acc)
    val input = MemoryStream[(Long, Double)]
    val ds = input.toDF().toDF("id", "value")
      .withColumn("keep", col("value") >= 10.0d)
    val observed = PipelineMetrics.observeGate(ds, "gate", "keep")
      .filter(col("keep"))
    val query = observed.writeStream.format("memory").queryName("metered")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)))
      query.processAllAvailable()
      input.addData(Seq((4L, 1.0), (5L, 99.0)))
      query.processAllAvailable()

      // totals span batches: 5 rows seen, 3 kept
      assert(acc.total("gate", "rows") == 5L)
      assert(acc.total("gate", "kept") == 3L)
      // and the data path saw only kept rows
      assert(spark.table("metered").count() == 3L)
    } finally {
      query.stop()
      spark.streams.removeListener(acc)
    }
  }

  test("volume observation sums the value column per batch") {
    implicit val sq = spark.sqlContext
    val acc = new PipelineMetrics.Accumulator
    spark.streams.addListener(acc)
    val input = MemoryStream[(Long, Long)]
    val observed = PipelineMetrics.observeVolume(
      input.toDF().toDF("id", "amount"), "vol", "amount")
    val query = observed.writeStream.format("memory").queryName("volumed")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq((1L, 10L), (2L, 20L)))
      query.processAllAvailable()
      input.addData(Seq((3L, 12L)))
      query.processAllAvailable()
      assert(acc.total("vol", "rows") == 3L)
      assert(acc.total("vol", "value_sum") == 42L)
    } finally {
      query.stop()
      spark.streams.removeListener(acc)
    }
  }
}
