package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec

/** Train/search split for the IVF index: the persisted-model search must
  * reproduce the inline s03 result while scanning the embeddings table
  * only once (model reuse = no re-training passes). */
class IvfModelSpec extends SparkSpec {

  test("searchIvf against a persisted model reproduces s03 exactly") {
    val modelPath = Files.createTempDirectory("ivf_model").toString
    Similarity.trainIvf(spark, sf, modelPath)
    val inline = Similarity.s03(spark, sf).collect().map(_.toString)
    val fromModel = Similarity.searchIvf(spark, sf, modelPath).collect().map(_.toString)
    assert(fromModel.sameElements(inline))

    // model is a reusable artifact: a second search re-reads it unchanged
    val again = Similarity.searchIvf(spark, sf, modelPath).collect().map(_.toString)
    assert(again.sameElements(inline))
  }

  test("search-only run scans the embeddings table at most once") {
    val modelPath = Files.createTempDirectory("ivf_model2").toString
    Similarity.trainIvf(spark, sf, modelPath)
    val df = Similarity.searchIvf(spark, sf, modelPath)
    df.collect()
    // after the ranked pass is cached, no embeddings file scan may appear
    // more than once anywhere in the executed plan (the member/probe self
    // join must reuse the cached pass, not rescan the corpus)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths.exists(_.toString.contains("embeddings")) => s
    }
    assert(scans.length <= 1, s"embeddings scanned ${scans.length} times")
  }
}
