package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dataset-path) materialized-frame memo — the
  * common-subexpression reuse a production curation run gets by
  * construction: expensive shared subplans (the J ≥ 0.5 pair stream,
  * the corpus-LM scored frame) compute once and every report operator
  * composing on top of them reads the persisted result.
  *
  * Stays correct in long-lived processes: entries whose SparkSession
  * has stopped are evicted (no pinned sessions / persisted frames
  * leaking across jobs), and a hit whose persistence was dropped by
  * `spark.catalog.clearCache()` (Bench runs it between queries)
  * rebuilds instead of silently handing back an unpersisted frame that
  * every consumer would then recompute from scratch. */
private[operators] object Memo {
  type Table = scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]

  def table(): Table =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def memoized(memo: Table, spark: SparkSession, dir: String,
               requirePersisted: Boolean)(build: => DataFrame): DataFrame = {
    memo.keysIterator.foreach { k =>
      if (k._1.sparkContext.isStopped) memo.remove(k)
    }
    val key = (spark, dir)
    memo.get(key) match {
      case Some(df) if !requirePersisted ||
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE => df
      case _ =>
        val df = build
        memo.put(key, df)
        df
    }
  }
}
