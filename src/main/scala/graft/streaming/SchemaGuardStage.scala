package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wire-format drift sentinel: tag (never drop) rows whose decoded
  * values are outside the contract the downstream pipeline assumes, so
  * a silent producer-side schema/unit change surfaces as a quarantine
  * stream instead of as corrupt aggregates weeks later.
  *
  * Motivated by this repo's own round-4 incident: the events parquet
  * timestamp changed logical annotation under a runtime that ignored
  * the legacy decode conf, and every downstream consumer broke at once.
  * Structured Streaming cannot see a TYPE change mid-stream (the schema
  * is pinned at start) — what drift actually looks like in-flight is
  * VALUES going out of range: an epoch column suddenly 1000× too large
  * (unit change), nulls where ids were, empty payload strings. Those
  * are exactly the row-level invariants this stage checks.
  *
  * All checks are plain Column predicates (codegen'd, stateless, no
  * shuffle) so the stage composes anywhere in a stream or batch plan at
  * zero coordination cost; `split` routes the tagged frame to main /
  * dead-letter sinks the way QuotaStage's kept flag does.
  */
object SchemaGuardStage {
  /** Plausible epoch-ms window: 2000-01-01 to 2100-01-01. A nanos or
    * micros value mistakenly decoded as ms lands ~3-6 orders of
    * magnitude above this band; a seconds value ~3 below. */
  val MinPlausibleMs: Long = 946684800000L
  val MaxPlausibleMs: Long = 4102444800000L

  /** Default invariants for the events wire format (`ms` epoch millis,
    * `event_id`/`user_id` non-null, non-empty `event_type`). Each pair
    * is (reason tag, violation predicate). */
  def eventInvariants: Seq[(String, Column)] = Seq(
    "ms_out_of_range" ->
      (col("ms").isNull || col("ms") < MinPlausibleMs || col("ms") > MaxPlausibleMs),
    "null_ids" -> (col("event_id").isNull || col("user_id").isNull),
    "empty_type" -> (col("event_type").isNull || col("event_type") === ""))

  /** Adds `quarantine` (bool) and `quarantine_reason` (first matching
    * tag, null when clean). Row order of `invariants` fixes reason
    * precedence. */
  def tag(df: DataFrame,
          invariants: Seq[(String, Column)] = eventInvariants): DataFrame = {
    val reason = invariants.foldRight(lit(null).cast("string")) {
      case ((name, bad), acc) => when(bad, lit(name)).otherwise(acc)
    }
    df.withColumn("quarantine_reason", reason)
      .withColumn("quarantine", col("quarantine_reason").isNotNull)
  }

  /** (clean, quarantined) split of a tagged frame — two filters over one
    * plan, usable as two writeStream sinks or one foreachBatch fork. */
  def split(tagged: DataFrame): (DataFrame, DataFrame) =
    (tagged.filter(!col("quarantine")), tagged.filter(col("quarantine")))
}
