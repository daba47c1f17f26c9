package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-checked loaders for the driver-generated parquet tables.
  *
  * All loaders are plain `spark.read.parquet` scans so Catalyst keeps
  * full pushdown/pruning freedom — callers `.select`/`.filter` and the
  * parquet source sees `PushedFilters`/`ReadSchema` accordingly.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Events table carries a parquet timestamp whose logical annotation
    * has drifted across driver rounds (TIMESTAMP NANOS originally,
    * MICROS now), and whose Spark resolution has drifted across
    * versions — ≤3.x legacy builds could surface nanos as raw int64
    * (`nanosAsLong`); 4.1+ reads either annotation as TIMESTAMP_NTZ and
    * silently ignores the legacy conf. The loader therefore branches on
    * the RESOLVED column type, not on any conf, and derives:
    *   - `ms`  : epoch milliseconds (matches DuckDB `epoch_ms(ts)` exactly;
    *             truncation composes for positive epochs:
    *             floor(floor(ns/1e3)/1e3) == floor(ns/1e6))
    *   - `ets` : ms-truncated TimestampType for date_trunc/window work.
    * No session-conf mutation: a table loader must not side-effect every
    * caller's session. Session TZ is UTC (Engine.session), so the
    * NTZ→timestamp cast is an identity reinterpretation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    val ms = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000000")
      case TimestampNTZType => expr("unix_micros(cast(ts as timestamp)) div 1000")
      case TimestampType    => expr("unix_micros(ts) div 1000")
      case other => throw new IllegalStateException(
        s"events.ts resolved as unsupported type $other — " +
          "expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
    raw.withColumn("ms", ms)
      .withColumn("ets", timestamp_millis(col("ms")))
  }
}
