package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Streaming incremental near-duplicate dedup — the stream form of batch
  * operator d09 (delta-vs-corpus): each micro-batch of documents is
  * deduplicated against the standing corpus INDEX, and only novel docs
  * flow into the curated corpus. The corpus is never re-deduplicated;
  * per-batch cost is batch-postings x matching-index-postings through a
  * shuffle join on the shingle key.
  *
  * A batch doc is dropped when:
  *   - an exact md5 twin exists in the index or earlier in the batch
  *     (keep-min doc_id within the batch), or
  *   - 3-gram Jaccard >= 0.8 against any indexed doc, or against a
  *     smaller-id batch doc (d03's inverted-index machinery — candidates
  *     share a shingle, verified with integer set arithmetic).
  *
  * Index layout under `indexDir` (plain parquet dirs on DFS, one
  * `epoch=N` subdir per micro-batch):
  *   hashes/    (doc_id, h)   md5 of every PROCESSED doc — also the
  *                            commit marker (see below)
  *   postings/  (doc_id, g)   shingle postings of accepted docs
  *   sizes/     (doc_id, n)   shingle-set sizes of accepted docs
  *
  * EXACTLY-ONCE under micro-batch redelivery, without a transactional
  * store: all writes go to `epoch=<id>` subdirectories in OVERWRITE
  * mode, ordered so `hashes` lands LAST. A redelivered epoch whose docs
  * are already in `hashes` is recognized by the doc_id guard and becomes
  * a no-op; a crash BEFORE the hashes write leaves the guard cold, so
  * redelivery recomputes the identical (deterministic) survivors and
  * overwrites the same epoch dirs. Either way the corpus converges to
  * one copy.
  */
object NearDupStage {

  /** The (DataFrame, Long) => Unit handler for `writeStream.foreachBatch`.
    * `batch` must carry (doc_id, text); extra columns ride along into the
    * corpus output. */
  def handler(corpusDir: String, indexDir: String): (DataFrame, Long) => Unit = {
    (batch, epochId) =>
      val spark = batch.sparkSession
      VectorFunctions.register(spark)
      val hashesDir = s"$indexDir/hashes"
      val postingsDir = s"$indexDir/postings"
      val sizesDir = s"$indexDir/sizes"
      val fs = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(hashesDir))

      // redelivery guard: already-processed doc_ids make this a no-op
      val fresh = if (hasIndex)
        batch.join(spark.read.parquet(hashesDir).select("doc_id"), Seq("doc_id"), "left_anti")
      else batch
      if (!fresh.isEmpty) {
        // 1: intra-batch exact dedup, keep-min doc_id per content hash
        val hashed = fresh.withColumn("h", md5(col("text"))).cache()
        val intra = hashed
          .withColumn("min_id", min(col("doc_id")).over(Window.partitionBy("h")))
          .filter(col("doc_id") === col("min_id")).drop("min_id")
        // 2: exact dedup vs the corpus hash index
        val exactSurv = (if (hasIndex)
          intra.join(spark.read.parquet(hashesDir).select("h").distinct(),
            Seq("h"), "left_anti")
        else intra).cache()

        // 3: near-dup candidates via shingle postings (never a cross join)
        val sh = exactSurv
          .select(col("doc_id"), expr("word_ngrams(text, 3)").as("grams"))
          .filter(size(col("grams")) >= 1).cache()
        val pb = sh.select(col("doc_id"), explode(col("grams")).as("g"))
        val nb = sh.select(col("doc_id"), size(col("grams")).cast("long").as("n"))
        val vsCorpus = if (hasIndex) {
          val pc = spark.read.parquet(postingsDir)
            .select(col("doc_id").as("c_id"), col("g"))
          val nc = spark.read.parquet(sizesDir)
            .select(col("doc_id").as("c_id"), col("n").as("cn"))
          pb.join(pc, "g")
            .groupBy(col("doc_id"), col("c_id")).agg(count(lit(1)).as("inter"))
            .join(nb, "doc_id").join(nc, "c_id")
            .filter(col("inter") * 5 >= (col("n") + col("cn") - col("inter")) * 4)
            .select("doc_id")
        } else spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
        val vsBatch = pb.as("a").join(pb.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("keep_id"), col("b.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("inter"))
          .join(nb.withColumnRenamed("doc_id", "keep_id").withColumnRenamed("n", "ka"), "keep_id")
          .join(nb, "doc_id")
          .filter(col("inter") * 5 >= (col("ka") + col("n") - col("inter")) * 4)
          .select("doc_id")
        val survivors = exactSurv
          .join(vsCorpus.unionByName(vsBatch).distinct(), Seq("doc_id"), "left_anti")
          .cache()

        // 4: epoch-dir overwrites; hashes (the commit marker) go LAST
        val ep = s"epoch=$epochId"
        survivors.drop("h")
          .write.mode(SaveMode.Overwrite).parquet(s"$corpusDir/$ep")
        val survSh = sh.join(survivors.select("doc_id"), "doc_id")
        survSh.select(col("doc_id"), explode(col("grams")).as("g"))
          .write.mode(SaveMode.Overwrite).parquet(s"$postingsDir/$ep")
        survSh.select(col("doc_id"), size(col("grams")).cast("long").as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$sizesDir/$ep")
        hashed.select("doc_id", "h")
          .write.mode(SaveMode.Overwrite).parquet(s"$hashesDir/$ep")
      }
  }
}
