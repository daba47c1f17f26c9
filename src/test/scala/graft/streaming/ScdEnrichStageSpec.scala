package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class ScdEnrichStageSpec extends SparkSpec {
  import spark.implicits._

  test("events pick the dimension version live at THEIR time, across batches") {
    implicit val sq = spark.sqlContext
    // user 1: bronze from t=100, gold from t=500; user 2: silver from t=0
    val dim = Seq((1L, 100L, "bronze"), (1L, 500L, "gold"), (2L, 0L, "silver"))
      .toDF("key", "valid_from_ms", "value")
    val packed = ScdEnrichStage.packVersions(dim)

    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ms")
    val query = ScdEnrichStage.enrich(events, packed)
      .writeStream.format("memory").queryName("scd")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 150L), (1L, 499L), (2L, 10L))
      query.processAllAvailable()
      input.addData((1L, 500L), (1L, 900L), (1L, 50L), (3L, 100L))
      query.processAllAvailable()

      val got = spark.table("scd").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ms"),
                   Option(r.getAs[String]("dim_value")).getOrElse("NULL")))
        .toSet
      assert(got == Set(
        (1L, 150L, "bronze"),  // after first version
        (1L, 499L, "bronze"),  // boundary: strictly before the gold cut
        (2L, 10L, "silver"),
        (1L, 500L, "gold"),    // exactly at valid_from → new version
        (1L, 900L, "gold"),
        (1L, 50L, "NULL"),     // before any version: passes through, null
        (3L, 100L, "NULL")))   // unknown key: passes through, null
    } finally query.stop()
  }
}
