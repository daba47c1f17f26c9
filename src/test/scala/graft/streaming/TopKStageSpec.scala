package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TopKStageSpec extends SparkSpec {
  import spark.implicits._

  test("leaderboard tracks cumulative counts across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[String]
    @volatile var board: Seq[(String, Long)] = Nil
    val query = TopKStage.start(input.toDF().toDF("event_type"), "event_type",
      k = 2, queryName = "topk") { top =>
      board = top.collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("n")).toSeq
    }
    try {
      input.addData("view", "view", "click", "purchase")
      query.processAllAvailable()
      assert(board == Seq("view" -> 2L, "click" -> 1L)) // click < purchase by key tie-break
      // second batch flips the leader and promotes purchase onto the board
      input.addData("purchase", "purchase", "purchase", "view")
      query.processAllAvailable()
      assert(board == Seq("purchase" -> 4L, "view" -> 3L))
    } finally query.stop()
  }

  test("topK is deterministic under count ties (key order)") {
    val counts = Seq(("b", 5L), ("a", 5L), ("c", 1L)).toDF("key", "n")
    val top = TopKStage.topK(counts, 2).collect().map(_.getAs[String]("key"))
    assert(top.sameElements(Array("a", "b")))
  }
}
