package graft.streaming

import graft.SparkSpec
import graft.streaming.SessionPipeline.{Ev, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("gap > 30min closes a session and opens a new one across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = SessionPipeline.sessionize(input.toDS())

    val query = sessions.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val h = 3600L * 1000
      // batch 1: one burst for user 1
      input.addData(Ev(1L, 0L), Ev(1L, 60000L), Ev(1L, 120000L))
      query.processAllAvailable()
      // batch 2: >30min later -> the first session must be emitted closed
      input.addData(Ev(1L, 2 * h), Ev(1L, 2 * h + 1000))
      query.processAllAvailable()

      val out = spark.table("sessions").as[Session].collect()
      assert(out.length == 1, s"expected exactly the closed first session, got ${out.mkString(";")}")
      assert(out.head == Session(1L, 0L, 120000L, 3L, 120000L))
    } finally query.stop()
  }

  test("events within the gap extend the open session (no emission)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = SessionPipeline.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions2")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(Ev(5L, 1000L))
      query.processAllAvailable()
      input.addData(Ev(5L, 1000L + SessionPipeline.GapMs)) // exactly at gap: still same session
      query.processAllAvailable()
      assert(spark.table("sessions2").count() == 0)
    } finally query.stop()
  }
}
