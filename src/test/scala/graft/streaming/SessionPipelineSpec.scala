package graft.streaming

import graft.SparkSpec
import graft.streaming.SessionPipeline.{Ev, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

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

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  test("event-time timeout emits the open session of a user who went silent") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = SessionPipeline.sessionizeWithTimeout(
      input.toDF().toDF("user_id", "ets"), watermark = "10 minutes")
    val query = sessions.writeStream
      .format("memory").queryName("timeout_sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, ts("2024-01-01T00:00:00Z")), (1L, ts("2024-01-01T00:05:00Z")))
      query.processAllAvailable()
      assert(spark.table("timeout_sessions").count() == 0) // still open
      // another user's event pushes the watermark far past user 1's gap horizon
      input.addData((2L, ts("2024-01-01T03:00:00Z")))
      query.processAllAvailable()
      input.addData((2L, ts("2024-01-01T03:00:01Z"))) // extra batch so timeouts fire
      query.processAllAvailable()
      val out = spark.table("timeout_sessions").as[Session].collect().filter(_.userId == 1L)
      assert(out.length == 1, s"expected user 1's timed-out session, got ${out.mkString(";")}")
      assert(out.head == Session(1L, ts("2024-01-01T00:00:00Z").getTime,
        ts("2024-01-01T00:05:00Z").getTime, 2L, 300000L))
    } finally query.stop()
  }

  test("built-in session_window emits the same closed sessions as the custom state") {
    implicit val sq = spark.sqlContext
    def run(name: String, f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Array[Session] = {
      val input = MemoryStream[(Long, Timestamp)]
      val query = f(input.toDF().toDF("user_id", "ets")).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        // two users, multi-session traffic, then a far-future watermark push
        input.addData(
          (1L, ts("2024-01-01T00:00:00Z")), (1L, ts("2024-01-01T00:10:00Z")),
          (2L, ts("2024-01-01T00:02:00Z")))
        query.processAllAvailable()
        input.addData( // >30min later: new sessions for both users
          (1L, ts("2024-01-01T01:00:00Z")),
          (2L, ts("2024-01-01T01:05:00Z")), (2L, ts("2024-01-01T01:06:00Z")))
        query.processAllAvailable()
        input.addData((99L, ts("2024-01-02T00:00:00Z"))) // watermark flush
        query.processAllAvailable()
        input.addData((99L, ts("2024-01-02T00:00:01Z"))) // extra batch so evictions fire
        query.processAllAvailable()
        spark.table(name).as[Session].collect()
          .filter(s => s.userId != 99L).sortBy(s => (s.userId, s.startMs))
      } finally query.stop()
    }
    val custom = run("sw_custom",
      df => SessionPipeline.sessionizeWithTimeout(df, "10 minutes").toDF())
    val builtin = run("sw_builtin",
      df => SessionPipeline.sessionizeBuiltin(df, "10 minutes"))
    assert(custom.length == 4, s"expected 4 closed sessions, got ${custom.mkString(";")}")
    assert(builtin.toSeq == custom.toSeq,
      s"builtin=${builtin.mkString(";")} custom=${custom.mkString(";")}")
  }
}
