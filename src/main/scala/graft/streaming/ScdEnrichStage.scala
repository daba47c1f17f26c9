package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension enrichment for a stream: attach to each
  * event the dimension attribute that was CURRENT at the event's own
  * time (as-of semantics, e08's batch operator in streaming form) —
  * plan-tier pricing, feature-flag state, account standing at event
  * time, not at read time.
  *
  * The trick that keeps it STATELESS (append mode, no watermark, no
  * state store): the static dimension is pre-collapsed to ONE row per
  * key holding its version history as a sorted array of (valid_from,
  * value) structs — version counts per key are small and bounded by
  * construction (a dim that changes per-event is a fact table). The
  * stream then does one equi join on the key (broadcast when the dim
  * fits, shuffle otherwise) and picks the as-of version with a pure
  * array expression (`filter` + `element_at(-1)`) — no per-event state,
  * no window, no shuffle of the stream beyond the join itself.
  *
  * Events BEFORE a key's first version (or with no dim row) pass
  * through with a NULL attribute — dropping them silently would turn a
  * dim-load gap into data loss.
  */
object ScdEnrichStage {

  /** Collapse a (key, valid_from_ms, value) version table to one row per
    * key with a chronologically sorted version array. Batch-side prep,
    * one shuffle of the DIM (never the stream). */
  def packVersions(dim: DataFrame,
                   keyCol: String = "key",
                   validFromCol: String = "valid_from_ms",
                   valueCol: String = "value"): DataFrame =
    dim.groupBy(col(keyCol).as("key"))
      .agg(sort_array(collect_list(struct(
        col(validFromCol).cast("long").as("vf"), col(valueCol).as("v")))).as("versions"))

  /** Enrich `events` (needs `user_id` + epoch-ms `ms`) with the as-of
    * value from `packed` (output of [[packVersions]]); emits every event
    * with `dim_value` (NULL when no version was live yet). */
  def enrich(events: DataFrame, packed: DataFrame): DataFrame =
    events
      .join(broadcast(packed), col("user_id") === col("key"), "left")
      .withColumn("live", expr("filter(versions, x -> x.vf <= ms)"))
      .withColumn("dim_value",
        when(size(col("live")) >= 1, expr("element_at(live, -1).v")))
      .drop("key", "versions", "live")
}
