package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped storage lifecycle for long-lived processes (an
  * operator server answering report queries for days — not the one-shot
  * Verify/Bench harness, which clearCaches between queries).
  *
  * Report operators pin shared frames (the J ≥ 0.5 pair stream, LM
  * scored frames, shingle caches) so composed reports reuse them;
  * [[release]] returns that storage to baseline between report batches
  * instead of waiting for LRU eviction pressure. After release, frames
  * previously returned by operators must not be reused — memoized
  * frames may be checkpoint-backed and cannot recompute; re-running the
  * operator rebuilds them. */
object Lifecycle {
  def release(spark: SparkSession): Unit = Memo.release(spark)
}
