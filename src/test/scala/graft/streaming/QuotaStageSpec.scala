package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class QuotaStageSpec extends SparkSpec {
  import spark.implicits._

  private val H = QuotaStage.WindowMs

  test("flood user capped per window, counter carries across batches, window reset restores quota") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ms")
      .withColumn("ets", timestamp_millis(col("ms")))
    val out = QuotaStage.enforce(events, maxPerWindow = 3)
    val query = out.writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      // batch 1: user 1 sends 5 events in hour 0; user 2 sends 2
      input.addData((1L to 5L).map(i => (1L, i * 1000L)) ++ Seq((2L, 1000L), (2L, 2000L)))
      query.processAllAvailable()
      // batch 2: user 1 sends 2 MORE in the same hour -> still over quota
      input.addData(Seq((1L, 10000L), (1L, 11000L)))
      query.processAllAvailable()
      // batch 3: next hour -> quota resets
      input.addData(Seq((1L, H + 1000L), (1L, H + 2000L)))
      query.processAllAvailable()

      val rows = spark.table("quota").collect()
        .map(r => (r.getAs[Long]("userId"), r.getAs[Long]("tsMs"), r.getAs[Boolean]("kept")))
      // every input event is emitted exactly once (tagged, never dropped)
      assert(rows.length == 11)
      val u1h0 = rows.filter(r => r._1 == 1L && r._2 < H)
      assert(u1h0.count(_._3) == 3, s"hour-0 kept: ${u1h0.mkString(",")}")
      assert(u1h0.count(!_._3) == 4, "cross-batch flood must stay capped")
      // the KEPT ones are the 3 earliest (event-time order within batch)
      assert(u1h0.filter(_._3).map(_._2).sorted.sameElements(Array(1000L, 2000L, 3000L)))
      // under-quota user untouched
      assert(rows.filter(_._1 == 2L).forall(_._3))
      // new window starts a fresh budget
      assert(rows.filter(r => r._1 == 1L && r._2 >= H).forall(_._3))
    } finally query.stop()
  }
}
