package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling/sliding window aggregation — the Spark-first form
  * of the KSE pipeline's "aggregate events per time bucket and index the
  * buckets" stage.
  *
  * State is bounded by the watermark: late events beyond `watermark` are
  * dropped and closed windows are evicted — mandatory at 100 TB/day.
  */
object WindowedAggPipeline {
  /** Tumbling window counts/sums per event_type over parsed events
    * (requires an `ets` timestamp column). */
  def tumbling(events: DataFrame,
               watermark: String = "10 minutes",
               windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value")).as("total_value"),
           approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n"), col("total_value"), col("approx_users"))

  /** Sliding window (overlapping) variant. */
  def sliding(events: DataFrame,
              watermark: String = "10 minutes",
              windowLen: String = "1 hour",
              slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n"), col("total_value"))
}
