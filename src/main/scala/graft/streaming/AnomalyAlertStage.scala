package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming volume-anomaly alerting: e13's 3-sigma hourly spike test
  * applied to a live event stream — the KSE "ops dashboard" stage that
  * pages when a topic's traffic departs from its historical profile.
  *
  * Shape: watermarked tumbling-window counts per event_type (bounded
  * state, closed windows evicted), then a stream-static broadcast join
  * against a BASELINE table of per-type historical moments (n, Σcnt,
  * Σcnt² — computed by a batch e13-style pass over the warehouse and
  * refreshed on whatever cadence the deployment wants). The spike test
  * is e13's integer cross-multiplication — `(n·cnt − S)² · (n−1) >
  * 9 · n · (n·Q − S²)` on DECIMAL(38,0) — so the alert decision has no
  * float boundary and is bit-identical to the batch operator's verdict
  * on the same bucket counts.
  *
  * Scale: per-micro-batch work is one windowed count (map-combinable)
  * plus a |types|-row broadcast join; state is one row per open
  * (window, type). No shuffle of raw events beyond the windowed agg. */
object AnomalyAlertStage {
  private val d38 = "decimal(38,0)"

  /** Per-type baseline moments from HISTORICAL hourly bucket counts:
    * (event_type, n, s, q) with n = #buckets, s = Σcnt, q = Σcnt². */
  def baseline(history: DataFrame): DataFrame =
    history
      .withColumn("hour_ms", col("ms") - col("ms") % 3600000L)
      .groupBy("event_type", "hour_ms")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
           sum(col("cnt") * col("cnt")).as("q"))
      .filter(col("n") >= 2)

  /** Alert stream: hourly windowed counts per type joined to the static
    * baseline; emits only buckets spiking above mean + 3 sample stddevs.
    * `events` needs an `ets` timestamp column (EventParser's contract). */
  def apply(events: DataFrame, baseline: DataFrame,
            watermark: String = "10 minutes"): DataFrame = {
    val nD = col("n").cast(d38)
    val dev = nD * col("cnt").cast(d38) - col("s").cast(d38)
    val varNum = nD * col("q").cast(d38) - col("s").cast(d38) * col("s").cast(d38)
    events
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(baseline), "event_type")
      .filter(col("n") * col("cnt") > col("s") &&
              dev * dev * (nD - 1) > lit(9).cast(d38) * nD * varNum)
      .select(col("window.start").as("window_start"),
              col("event_type"), col("cnt"),
              (col("s").cast("double") / col("n")).as("mean_cnt"))
  }

  /** Convenience: run the alert stream into an in-memory sink (tests /
    * local ops); production deployments point the same frame at the ES
    * bulk sink or foreachBatch upsert. */
  def start(spark: SparkSession, events: DataFrame, base: DataFrame,
            queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    apply(events, base)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("update")
      .start()
}
