package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream attribution join: attach each purchase to a preceding
  * view by the same user within the attribution window.
  *
  * Both sides are watermarked, and the join condition bounds event-time
  * distance — that pair of constraints is what lets Spark evict state
  * (views older than the window + watermark can never match again). An
  * unbounded stream-stream join would grow state forever; this is the
  * canonical bounded form.
  */
object AttributionJoin {
  /** `views` / `purchases`: parsed event frames with `user_id`, `ets`,
    * and `event_id`. Emits one row per (purchase, qualifying view) pair;
    * downstream can keep the latest view per purchase with
    * ForeachBatchUpsert.dedupeLatest(batch, "purchase_id", "view_ets"). */
  def attribute(views: DataFrame, purchases: DataFrame,
                watermark: String = "10 minutes",
                window: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("user_id").as("view_user"), col("ets").as("view_ets"),
              col("event_id").as("view_id"))
      .withWatermark("view_ets", watermark)
    val p = purchases
      .select(col("user_id"), col("ets").as("purchase_ets"),
              col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ets", watermark)
    p.join(v,
        col("user_id") === col("view_user") &&
        col("view_ets") <= col("purchase_ets") &&
        col("view_ets") >= col("purchase_ets") - expr(s"INTERVAL $window"))
      .drop("view_user")
  }
}
