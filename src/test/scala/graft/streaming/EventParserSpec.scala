package graft.streaming

import graft.SparkSpec

class EventParserSpec extends SparkSpec {
  import spark.implicits._

  test("parses well-formed events into typed columns") {
    val raw = Seq(
      """{"event_id": 1, "ts": "2024-01-01T00:00:05Z", "user_id": 7, "event_type": "view", "value": 1.5, "props": "{\"k\": 3}"}""",
      """{"event_id": 2, "ts": "2024-01-01T00:10:00Z", "user_id": 7, "event_type": "click", "value": 2.0, "props": "{}"}""")
      .toDF("value")
    val parsed = EventParser.valid(EventParser.parse(raw)).collect()
    assert(parsed.length == 2)
    val first = parsed.minBy(_.getAs[Long]("event_id"))
    assert(first.getAs[Long]("user_id") == 7L)
    assert(first.getAs[String]("event_type") == "view")
    assert(first.getAs[java.sql.Timestamp]("ets").toInstant.toString == "2024-01-01T00:00:05Z")
  }

  test("malformed records are quarantined, not fatal") {
    val raw = Seq(
      """{"event_id": 1, "ts": "2024-01-01T00:00:05Z", "user_id": 7, "event_type": "view", "value": 1.5, "props": "{}"}""",
      """{not json at all""",
      """{"event_id": "not-a-number-is-null", "ts": "2024-01-01T00:00:06Z", "event_type": "view"}""")
      .toDF("value")
    val parsed = EventParser.parse(raw)
    val ok = EventParser.valid(parsed).collect()
    assert(ok.length == 1 && ok.head.getAs[Long]("event_id") == 1L)
    // all three input rows survive parsing (stream never dies)
    assert(parsed.count() == 3)
  }
}
