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

  test("leaderboard state survives a stop/restart from checkpoint") {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("topk-ckpt").toString
    val input = MemoryStream[String]
    @volatile var board: Seq[(String, Long)] = Nil
    def run() = TopKStage.start(input.toDF().toDF("event_type"), "event_type",
      k = 2, queryName = "topk_r", checkpointDir = Some(ckpt)) { top =>
      board = top.collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("n")).toSeq
    }
    val q1 = run()
    input.addData("view", "view", "view", "click")
    q1.processAllAvailable()
    q1.stop()
    assert(board == Seq("view" -> 3L, "click" -> 1L))
    // restart from the same checkpoint: counts accumulate, not reset
    val q2 = run()
    try {
      input.addData("click", "click", "click")
      q2.processAllAvailable()
      assert(board == Seq("click" -> 4L, "view" -> 3L),
        s"state lost across restart: $board")
    } finally q2.stop()
  }

  test("topK is deterministic under count ties (key order)") {
    val counts = Seq(("b", 5L), ("a", 5L), ("c", 1L)).toDF("key", "n")
    val top = TopKStage.topK(counts, 2).collect().map(_.getAs[String]("key"))
    assert(top.sameElements(Array("a", "b")))
  }
}
