package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Streaming corpus curation: the batch curation gates applied to a
  * document STREAM — quality score (t02's exact arithmetic), language
  * prediction (t03's argmax heuristic), and temperature-mix sampling
  * (t12's deterministic md5-prefix draw).
  *
  * Every gate is a stateless per-row Column expression, so the stage
  * needs NO streaming state, no watermark, and no shuffle: each
  * micro-batch filters independently and the output is bit-identical
  * to running the batch operators over the same rows (spec-proven).
  * The language mix rates are a STATIC frame (stream-static broadcast
  * join) — computed from corpus statistics by a batch t12 run or from
  * config, because a stream cannot know language frequencies ahead of
  * time; re-deploy with refreshed rates as the corpus drifts.
  */
object CurationStage {

  /** Gate a document stream (doc_id, text, ...) against a quality
    * threshold and a static (lang, thr) rate table keyed by PREDICTED
    * language. Emits doc_id, text, pred_lang, quality. The rate
    * columns are renamed before the join so a stream that carries its
    * own `lang`/`thr` columns (the full documents contract does) can't
    * collide with them. */
  def apply(docs: DataFrame, rates: DataFrame, minQuality: Double = 0.5): DataFrame =
    TextAnalysis.addPredicted(TextAnalysis.addQuality(docs))
      .filter(col("quality") >= lit(minQuality))
      .join(broadcast(rates.select(col("lang").as("mix_lang"), col("thr").as("mix_thr"))),
        col("predicted") === col("mix_lang"))
      .filter(substring(md5(col("text")), 1, 8) <= col("mix_thr"))
      .select(col("doc_id"), col("text"),
        col("predicted").as("pred_lang"), col("quality"))
}
