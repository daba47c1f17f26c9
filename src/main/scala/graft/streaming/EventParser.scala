package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON event parsing: Kafka `value` bytes -> typed event columns.
  *
  * Permissive mode: malformed records land in `_corrupt` instead of
  * failing the stream (poison-pill tolerance — at 100 TB there WILL be
  * bad records). Works identically on batch and streaming DataFrames.
  */
object EventParser {
  /** Wire schema of a KSE event payload. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType), // ISO-8601; parsed to timestamp below
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt", StringType)))

  /** Parse a DataFrame bearing a binary/string `value` column. */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("e"))
      .select(
        col("e.event_id").as("event_id"),
        to_timestamp(col("e.ts")).as("ets"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"),
        col("e._corrupt").as("corrupt"))

  /** Valid events only (drops corrupt / schema-violating rows). */
  def valid(parsed: DataFrame): DataFrame =
    parsed.filter(col("corrupt").isNull && col("event_id").isNotNull &&
      col("ets").isNotNull && col("event_type").isNotNull)
}
