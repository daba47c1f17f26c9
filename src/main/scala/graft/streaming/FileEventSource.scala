package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-drop streaming source: tail a drop DIRECTORY of event
  * parquet files as a stream — the replay/backfill twin of the Kafka
  * source. `maxFilesPerTrigger` bounds per-batch intake the way
  * `maxOffsetsPerTrigger` does for Kafka.
  *
  * Emits the same columns as `Tables.events` (`ms` epoch millis, `ets`
  * microsecond timestamp), so every downstream pipeline stage
  * (EventParser not needed here; windowing/sessionization) is reusable
  * unchanged between live Kafka and file replay.
  */
object FileEventSource {
  /** Parquet wire schema (ts = raw int64 nanos; see Tables.events). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def stream(spark: SparkSession, dropDir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dropDir)
      .withColumn("ms", expr("ts div 1000000"))
      .withColumn("ets", timestamp_millis(expr("ts div 1000000")))
  }
}
