package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class TextSourcesSpec extends SparkSpec {

  private def docKey(r: org.apache.spark.sql.Row): (Long, String, String, String, Long) =
    (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("lang"),
     r.getAs[String]("source"), r.getAs[Long]("n_chars"))

  test("jsonl round-trips the documents table losslessly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-jsonl").toString
    docs.write.mode("overwrite").json(dir)
    val in = TextSources.jsonlDocuments(spark, dir)
    assert(in.rejects.count() == 0L)
    assert(in.clean.collect().map(docKey).toSet == docs.collect().map(docKey).toSet)
  }

  test("csv round-trips the documents table losslessly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite").options(TextSources.csvWriteOptions).csv(dir)
    val in = TextSources.csvDocuments(spark, dir)
    assert(in.rejects.count() == 0L)
    assert(in.clean.collect().map(docKey).toSet == docs.collect().map(docKey).toSet)
  }

  test("malformed jsonl lines quarantine without failing or vanishing") {
    val dir = Files.createTempDirectory("graft-bad").toString
    Files.write(Paths.get(dir, "part-0.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "good one", "lang": "en", "source": "s", "n_chars": 8}""",
      """not json at all {{{""",
      """{"doc_id": 2, "lang": "en"}""", // parses but lacks required text
      """{"doc_id": "x", "text": "bad type", "lang": "en", "source": "s", "n_chars": 1}""",
      """{"doc_id": 3, "text": "also good", "lang": "de", "source": "s", "n_chars": 9}"""))
    val in = TextSources.jsonlDocuments(spark, dir)
    assert(in.clean.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(in.rejects.count() == 3L)
    // EVERY reject keeps its raw line for audit/replay — including rows
    // that parse fine but lack a required key
    val raw = in.rejects.select("_corrupt_record").collect().map(_.getString(0))
    assert(raw.forall(_ != null))
    assert(raw.exists(_.contains("not json at all")))
    assert(raw.exists(_.contains(""""doc_id": 2""")))
  }

  test("malformed csv rows quarantine and clean rows survive") {
    val dir = Files.createTempDirectory("graft-badcsv").toString
    Files.write(Paths.get(dir, "part-0.csv"), java.util.Arrays.asList(
      "doc_id,text,lang,source,n_chars",
      "1,\"ok, with comma and \"\"quote\"\"\",en,s,24",
      "oops,this row has a bad key type,en,s,5",
      "2,fine,de,s,4"))
    val in = TextSources.csvDocuments(spark, dir)
    assert(in.clean.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(in.clean.filter(col("doc_id") === 1L).select("text").head().getString(0)
      == "ok, with comma and \"quote\"")
    assert(in.rejects.count() == 1L)
  }

  test("orc round-trips losslessly, quarantines null-required rows, pushes filters") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(dir)
    val in = TextSources.orcDocuments(spark, dir)
    assert(in.rejects.count() == 0L)
    assert(in.clean.collect().map(docKey).toSet == docs.collect().map(docKey).toSet)
    // contract-violating rows (null required field) quarantine
    val dir2 = Files.createTempDirectory("graft-orc2").toString
    import spark.implicits._
    Seq((1L, "good", "en", "s", 4L), (2L, null, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").orc(dir2)
    val in2 = TextSources.orcDocuments(spark, dir2)
    assert(in2.clean.select("doc_id").as[Long].collect().sameElements(Array(1L)))
    assert(in2.rejects.count() == 1L)
    // filters reach the orc scan (format-agnostic pushdown)
    val q = in.clean.filter(col("n_chars") > 100).select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("n_chars"),
      s"no pushdown in orc scan plan:\n$plan")
  }
}
