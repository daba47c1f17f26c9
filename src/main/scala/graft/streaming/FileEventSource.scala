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
  /** Parquet wire schema. `ts` is declared LongType: the drop files'
    * timestamp column is physically INT64 whatever its logical
    * annotation (TIMESTAMP NANOS in early testdata, MICROS now), and a
    * user-supplied LongType schema reads that physical int64 directly on
    * every Spark version — no reliance on the removed `nanosAsLong`
    * legacy conf, and no logical-type resolution drift (the round-4
    * breakage mode of the batch loader). The epoch UNIT is then
    * normalized per-row in `stream` below. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def stream(spark: SparkSession, dropDir: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    // Streaming sources need a static schema, so the unit can't be read
    // from file metadata up front the way Tables.events branches on the
    // resolved type. Sniff it per-row from magnitude instead — for any
    // epoch after 2001-09 (micros > 1e15) and before year 5138 (ms),
    // nanos > 1e17 ⟺ the value is nanoseconds, else microseconds. One
    // codegen'd CASE WHEN; keeps replay correct across drop files
    // written in either unit (the testdata itself switched units
    // between rounds).
    val msFromInt64 =
      when(abs(col("ts")) > lit(100000000000000000L), expr("ts div 1000000"))
        .otherwise(expr("ts div 1000"))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dropDir)
      .withColumn("ms", msFromInt64)
      .withColumn("ets", timestamp_millis(col("ms")))
  }
}
