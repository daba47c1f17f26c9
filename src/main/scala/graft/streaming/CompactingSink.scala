package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.engine.Warehouse

/** Streaming → warehouse sink with standing compaction: each micro-batch
  * APPENDS day-partitioned parquet (one file per trigger per partition —
  * the small-file problem by construction), and every `compactEvery`
  * batches the sink runs [[Warehouse.compact]] over the path, coalescing
  * each day back to ~targetRows-row sorted files.
  *
  * Running compaction INSIDE foreachBatch is what makes the otherwise
  * concurrent-writer-sensitive swap safe here: micro-batches of one query
  * serialize, so the sink is provably quiesced for the sub-second rename
  * window — no external locking. (Compact's snapshot+carry-across still
  * protects against OTHER writers on the same path.)
  *
  * Delivery semantics: plain append is AT-LEAST-ONCE under batch
  * re-delivery after a crash; when exactly-once matters, key the rows and
  * front with [[ForeachBatchUpsert]] instead — this sink's job is the
  * file-layout lifecycle, not dedup.
  */
object CompactingSink {

  /** foreachBatch handler. `msCol` drives the dt=YYYY-MM-DD partition;
    * `sortCols` order rows within files (row-group min/max skipping). */
  def handler(path: String,
              msCol: String = "ms",
              sortCols: Seq[String] = Seq("user_id", "ms"),
              compactEvery: Long = 10L,
              targetRows: Long = 1000000L): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      Warehouse.withDayPartition(batch, msCol)
        .write.mode(SaveMode.Append).partitionBy("dt").parquet(path)
      if (batchId > 0 && batchId % compactEvery == 0)
        Warehouse.compact(batch.sparkSession, path, Seq("dt"), sortCols, targetRows)
    }
}
