package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming heavy hitters: a continuously-maintained top-k leaderboard
  * over an event stream (q37's streaming complement — "which keys are
  * hot RIGHT NOW" for dashboards, throttles, hot-shard alarms).
  *
  * Shape: a stateful global `groupBy(key).count()` — state is ONE counter
  * row per distinct key, so this is for BOUNDED key domains (event types,
  * status codes, country codes, tenant ids). Each trigger, foreachBatch
  * receives the updated counts and takes top-k via TakeOrdered (k rows
  * per partition to one merge — never a global sort). For unbounded key
  * domains the state itself is the problem; cap the domain upstream
  * (project a bounded attribute, or bucket the long tail into an "other"
  * key) the same way d06 caps posting lists.
  */
object TopKStage {
  /** The running per-key counts (unbounded aggregation — no watermark:
    * counts must never be evicted). */
  def runningCounts(events: DataFrame, keyCol: String): DataFrame =
    events.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))

  /** Deterministic top-k of a counts frame (ties broken by key). */
  def topK(counts: DataFrame, k: Int): DataFrame =
    counts.orderBy(col("n").desc, col("key")).limit(k)

  /** Start the leaderboard query: every trigger, `publish` receives the
    * fresh top-k (e.g. to overwrite a serving table or push a metric).
    * Complete output mode re-emits all counter rows per trigger — the
    * right contract here because top-k is a GLOBAL property: an
    * update-mode delta could silently drop a key that fell out of the
    * changed set but still belongs on the board. */
  def start(events: DataFrame, keyCol: String, k: Int, queryName: String,
            checkpointDir: Option[String] = None)(
      publish: DataFrame => Unit): StreamingQuery = {
    val w = runningCounts(events, keyCol)
      .writeStream
      .outputMode(OutputMode.Complete())
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) => publish(topK(batch, k)) }
    // with a checkpoint, the counter state survives restarts — the
    // leaderboard resumes from cumulative counts, not from zero
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }
}
