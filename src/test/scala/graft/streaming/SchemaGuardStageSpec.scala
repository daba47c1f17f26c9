package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SchemaGuardStageSpec extends SparkSpec {
  import spark.implicits._

  test("unit drift is quarantined: micros-as-ms lands out of the epoch band") {
    val goodMs = 1704067200000L // 2024-01-01
    val df = Seq(
      (1L, 10L, goodMs),          // clean
      (2L, 11L, goodMs * 1000L),  // micros decoded as ms — the round-4 drift shape
      (3L, 12L, goodMs / 1000L)   // seconds decoded as ms
    ).toDF("event_id", "user_id", "ms").withColumn("event_type", lit("click"))
    val tagged = SchemaGuardStage.tag(df)
    val (clean, bad) = SchemaGuardStage.split(tagged)
    assert(clean.select("event_id").as[Long].collect().toSeq == Seq(1L))
    val reasons = bad.select("event_id", "quarantine_reason").as[(Long, String)]
      .collect().toMap
    assert(reasons == Map(2L -> "ms_out_of_range", 3L -> "ms_out_of_range"))
  }

  test("null ids and empty types get their own reasons; precedence is declaration order") {
    val goodMs = 1704067200000L
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String)](
      (Long.box(1L), null, Long.box(goodMs), "click"),      // null user
      (Long.box(2L), Long.box(5L), Long.box(goodMs), ""),   // empty type
      (Long.box(3L), null, null, "")                        // several: first reason wins
    ).toDF("event_id", "user_id", "ms", "event_type")
    val tagged = SchemaGuardStage.tag(df)
    val reasons = tagged.filter(col("quarantine"))
      .select("event_id", "quarantine_reason").as[(Long, String)].collect().toMap
    assert(reasons(1L) == "null_ids")
    assert(reasons(2L) == "empty_type")
    assert(reasons(3L) == "ms_out_of_range") // listed first in eventInvariants
  }

  test("runs inside a stream: quarantine flows through a MemoryStream micro-batch") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("event_id", "user_id", "ms")
      .withColumn("event_type", lit("view"))
    val tagged = SchemaGuardStage.tag(events)
    val query = tagged.writeStream.format("memory").queryName("guard")
      .outputMode("append").start()
    try {
      val goodMs = 1704067200000L
      input.addData(Seq((1L, 10L, goodMs), (2L, 11L, goodMs * 1000000L)))
      query.processAllAvailable()
      val rows = spark.table("guard")
        .select("event_id", "quarantine").as[(Long, Boolean)].collect().toMap
      assert(rows == Map(1L -> false, 2L -> true))
    } finally query.stop()
  }

  test("the real events table is fully clean under the default invariants") {
    val ev = graft.engine.Tables.events(spark, sf)
    val (clean, bad) = SchemaGuardStage.split(SchemaGuardStage.tag(ev))
    assert(bad.count() == 0L)
    assert(clean.count() == 1000L)
  }
}
