package graft.streaming

import graft.SparkSpec
import graft.streaming.SeasonalDeviationStage.Deviation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, expr, lit, timestamp_millis}
import org.apache.spark.sql.streaming.OutputMode

/** Lambda parity for the seasonal-deviation tracker: the streaming stage,
  * replayed over the real sf0.001 events and flushed (sentinel advances
  * the watermark past every open hour), must emit exactly the batch
  * hour-vs-week-earlier frame — same hours, same counts, same ppm
  * deviations, each hour exactly once. */
class SeasonalDeviationParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming deviations over replayed + flushed sf0.001 events equal the batch 168h-lag frame") {
    implicit val sq = spark.sqlContext

    // batch twin: hourly counts left-joined on the exact 168-hour lag
    val hours = graft.engine.Tables.events(spark, sf)
      .select(expr("ms div 3600000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
    val lagged = hours.select((col("h") + 168).as("h"), col("n").as("n_prev"))
    val expected = hours.join(lagged, Seq("h"), "left").collect().map { r =>
      val h = r.getLong(0); val n = r.getLong(1)
      val prev = if (r.isNullAt(2)) None else Some(r.getLong(2))
      (h, (n, prev, prev.map(p => math.abs(n - p) * 1000000L / p)))
    }.toMap

    val ms = graft.engine.Tables.events(spark, sf)
      .select("ms").collect().map(_.getLong(0)).sorted
    val maxMs = ms.last
    val sentinelMs = maxMs + 30L * 86400000L // +30 days: past every horizon
    val sentinelHour = sentinelMs / 3600000L

    val input = MemoryStream[Long]
    val events = input.toDS().select(timestamp_millis(col("value")).as("ets"))
    val query = SeasonalDeviationStage.detect(events).writeStream
      .format("memory").queryName("parity_seasonal")
      .outputMode(OutputMode.Append())
      .start()
    val streamed =
      try {
        val chunks = ms.grouped(math.max(1, ms.length / 4 + 1)).toSeq
        chunks.foreach { c => input.addData(c.toIndexedSeq); query.processAllAvailable() }
        input.addData(sentinelMs)
        query.processAllAvailable()
        spark.table("parity_seasonal").as[Deviation].collect()
          .filter(_.absHour < sentinelHour)
      } finally query.stop()

    val got = streamed.map(d => d.absHour -> ((d.n, d.nPrev, d.devPpm))).toMap
    assert(streamed.length == got.size, "an hour was emitted more than once")
    assert(got == expected,
      s"streaming/batch mismatch: ${got.size} streamed vs ${expected.size} batch; " +
        s"sample diff: ${(got.toSet diff expected.toSet).take(3)} / " +
        s"${(expected.toSet diff got.toSet).take(3)}")
    // hour-of-week tag sanity on the emitted rows
    streamed.foreach(d => assert(d.hourOfWeek == java.lang.Math.floorMod(d.absHour, 168L)))
  }
}
