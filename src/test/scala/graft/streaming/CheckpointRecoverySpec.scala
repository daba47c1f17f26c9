package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files
import java.sql.Timestamp

/** Restart-with-checkpoint semantics: a stopped windowed aggregation
  * resumes from its checkpoint, keeps state (open windows), and emits
  * each closed window exactly once across the restart boundary. */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("windowed agg survives stop/restart without duplicate or lost windows") {
    implicit val sq = spark.sqlContext
    val ckpt = Files.createTempDirectory("ckpt").toString
    val outDir = Files.createTempDirectory("out").toString

    val input = MemoryStream[(Timestamp, Long, String, Double)]
    def agg = WindowedAggPipeline.tumbling(
      input.toDF().toDF("ets", "user_id", "event_type", "value"),
      watermark = "5 minutes", windowLen = "1 hour")

    // run 1: two events in hour 0; watermark not advanced -> nothing closed
    val q1 = agg.writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
    input.addData((ts("2024-01-01T00:05:00Z"), 1L, "view", 1.0),
                  (ts("2024-01-01T00:45:00Z"), 2L, "view", 2.0))
    q1.processAllAvailable()
    q1.stop()

    // run 2: same checkpoint; advance watermark far enough to close hour 0
    val q2 = agg.writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
    input.addData((ts("2024-01-01T02:30:00Z"), 3L, "view", 1.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(outDir).collect()
    // exactly ONE closed window: hour 0 with BOTH pre-restart events
    assert(rows.length == 1, s"expected 1 closed window, got ${rows.mkString(";")}")
    assert(rows.head.getAs[Long]("n") == 2L)
    assert(rows.head.getAs[Double]("total_value") == 3.0)
    assert(rows.head.getAs[Timestamp]("window_start").toInstant.toString == "2024-01-01T00:00:00Z")
  }
}
