package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming daily-active-users sketch: HLL++ approx_count_distinct per
  * epoch-day tumbling window — the live twin of the batch e101 audit.
  *
  * Exact DISTINCT is not expressible in a streaming aggregation (and at
  * 100 TB/day the exact user-day shuffle is the cost being avoided); the
  * HLL++ register state is a few KB per open window, merges by register
  * max (order- and batch-boundary-independent), so a replay of the same
  * events produces the BIT-IDENTICAL estimate the batch path computes —
  * the property DauSketchParitySpec pins against e101. Late data beyond
  * the watermark is dropped and closed windows evicted, bounding state to
  * (open days) × (sketch size).
  */
object DauSketchStage {
  /** Events case class for replay specs (mirrors SessionPipeline.Ev). */
  case class UEv(userId: Long, tsMs: Long)

  /** Daily DAU sketch over parsed events (requires `user_id` and an
    * event-time `ets` timestamp column). Day index matches the batch
    * convention `ms div 86400000` (epoch days — Spark windows align to
    * the epoch). */
  def dailyDau(events: DataFrame,
               watermark: String = "1 hour",
               rsd: Double = 0.05): DataFrame =
    events
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_dau"))
      .select(expr("unix_timestamp(window.start) div 86400").as("day"),
              col("approx_dau"))

  /** Daily DAU via the library's own kmv_distinct TypedImperativeAggregate
    * (functions/SketchAggregates.scala): the KMV buffer serializes into
    * the state store between micro-batches, and its lattice-join merge is
    * order-independent, so a replay reproduces the batch e103 estimate
    * bit-exactly — the custom-aggregate-in-streaming path the HLL variant
    * above can't give an oracle for. */
  def dailyDauKmv(events: DataFrame,
                  watermark: String = "1 hour",
                  k: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(events.sparkSession)
    events
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 day"))
      .agg(expr(s"kmv_distinct(user_id, $k)").as("s"))
      .select(expr("unix_timestamp(window.start) div 86400").as("day"),
              col("s.n_kept").as("n_kept"),
              col("s.est_distinct").as("est_distinct"))
  }
}
