package graft.streaming

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class CurationStageSpec extends SparkSpec {
  import spark.implicits._

  test("streamed curation equals the batch gates over the same rows") {
    implicit val sq = spark.sqlContext
    // static rates: en down-sampled hard, others kept fully
    val rates = Seq(("en", "20000000"), ("es", "ffffffff"), ("de", "ffffffff"),
      ("fr", "ffffffff"), ("zh", "ffffffff"), ("und", "ffffffff"))
      .toDF("lang", "thr")

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(200).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)]
    val stream = CurationStage(input.toDF().toDF("doc_id", "text"), rates)
    val query = stream.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      // two micro-batches: per-row gates must not depend on batch boundaries
      input.addData(docs.take(100).toSeq)
      query.processAllAvailable()
      input.addData(docs.drop(100).toSeq)
      query.processAllAvailable()

      val streamed = spark.table("curated").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pred_lang"),
          r.getAs[Double]("quality"))).toSet
      val batch = CurationStage(
        docs.toSeq.toDF("doc_id", "text"), rates).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pred_lang"),
          r.getAs[Double]("quality"))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < docs.length) // gates actually drop
      // the en down-sampling bites: kept en docs are a strict subset
      val keptLangs = streamed.groupBy(_._2).view.mapValues(_.size).toMap
      val batchAll = CurationStage(docs.toSeq.toDF("doc_id", "text"),
        rates.withColumn("thr", lit("ffffffff"))).collect()
        .map(r => r.getAs[String]("pred_lang"))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(keptLangs.getOrElse("en", 0) < batchAll.getOrElse("en", 1))
      // a frame carrying its own lang column must not collide with rates
      val withLang = docs.toSeq.toDF("doc_id", "text").withColumn("lang", lit("xx"))
      assert(CurationStage(withLang, rates).count() == batch.size)
    } finally query.stop()
  }
}
