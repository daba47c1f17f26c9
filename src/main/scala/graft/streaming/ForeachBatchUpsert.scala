package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** foreachBatch idempotent-upsert sink pattern.
  *
  * Streaming micro-batches can be re-delivered after failure; an
  * idempotent sink must (1) dedupe within the batch keeping the latest
  * version per key and (2) upsert by key so re-processing converges to
  * the same target state. Here the target is a parquet directory
  * partitioned by key-hash bucket; a real deployment would swap in a
  * MERGE-capable store.
  */
object ForeachBatchUpsert {
  /** Keep the newest row per key within a micro-batch (deterministic:
    * ties broken by all remaining columns via the version column). */
  def dedupeLatest(batch: DataFrame, keyCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(versionCol).desc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The (DataFrame, Long) => Unit handler to pass to
    * `writeStream.foreachBatch`. Writes each deduped batch to
    * `targetDir/key_bucket=<n>/` with dynamic partition overwrite so a
    * re-run of the same batch rewrites identical files (idempotent). */
  def handler(targetDir: String, keyCol: String, versionCol: String, buckets: Int = 16)
      : (DataFrame, Long) => Unit = { (batch, _) =>
    val deduped = dedupeLatest(batch, keyCol, versionCol)
      .withColumn("key_bucket", pmod(hash(col(keyCol)), lit(buckets)))
    deduped.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    deduped.write
      .mode("overwrite")
      .partitionBy("key_bucket")
      .parquet(targetDir)
  }
}
