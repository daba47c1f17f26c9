package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

class NearDupStageSpec extends SparkSpec {
  import spark.implicits._

  // 20-token base text: J(base, base + one word) = 18/19 ≈ 0.947 ≥ 0.8
  private val baseText = (1 to 20).map(i => s"w$i").mkString(" ")
  private val nearText = baseText + " extra"
  private val otherText = (1 to 20).map(i => s"z$i").mkString(" ")

  test("batches dedupe against the growing corpus; exact and near dups dropped") {
    val corpus = Files.createTempDirectory("ndcorpus").toString
    val index = Files.createTempDirectory("ndindex").toString
    val h = NearDupStage.handler(corpus, index)

    h(Seq((1L, baseText), (2L, otherText)).toDF("doc_id", "text"), 0L)
    // 3 = exact copy of 1, 4 = near copy (J≈0.947) of 2, 5 = novel
    val novel = (1 to 20).map(i => s"q$i").mkString(" ")
    h(Seq((3L, baseText), (4L, otherText + " extra"), (5L, novel)).toDF("doc_id", "text"), 1L)

    val got = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 5L), s"corpus = ${got.mkString(",")}")
  }

  test("intra-batch exact + near dups resolve to the smallest doc_id") {
    val corpus = Files.createTempDirectory("ndcorpus2").toString
    val index = Files.createTempDirectory("ndindex2").toString
    val h = NearDupStage.handler(corpus, index)
    h(Seq((7L, baseText), (3L, baseText), (9L, nearText), (8L, otherText))
      .toDF("doc_id", "text"), 0L)
    val got = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
    // 3 keeps the exact group; 9 (near dup of 3's text) drops; 8 novel
    assert(got.toSeq == Seq(3L, 8L), s"corpus = ${got.mkString(",")}")
  }

  test("redelivered epoch is a no-op (exactly-once corpus)") {
    val corpus = Files.createTempDirectory("ndcorpus3").toString
    val index = Files.createTempDirectory("ndindex3").toString
    val h = NearDupStage.handler(corpus, index)
    val b0 = Seq((1L, baseText), (2L, otherText)).toDF("doc_id", "text")
    h(b0, 0L)
    h(b0, 0L) // redelivery after a sink-side failure
    val got = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
    // index also converged to one copy per doc
    val idx = spark.read.parquet(s"$index/hashes").select("doc_id").as[Long].collect().sorted
    assert(idx.toSeq == Seq(1L, 2L))
  }

  test("crash before the hashes commit marker recovers by recompute") {
    val corpus = Files.createTempDirectory("ndcorpus4").toString
    val index = Files.createTempDirectory("ndindex4").toString
    val h = NearDupStage.handler(corpus, index)
    h(Seq((1L, baseText)).toDF("doc_id", "text"), 0L)
    // simulate: epoch 1's corpus write happened but the commit marker
    // (hashes/epoch=1) never landed
    val b1 = Seq((6L, (1 to 20).map(i => s"r$i").mkString(" "))).toDF("doc_id", "text")
    h(b1, 1L)
    val marker = new java.io.File(s"$index/hashes/epoch=1")
    assert(marker.exists)
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(delete)); f.delete()
    }
    delete(marker)
    h(b1, 1L) // redelivery: guard is cold -> full recompute, same epoch dirs
    val got = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 6L), s"corpus = ${got.mkString(",")}")
  }
}
