package graft.streaming

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class AnomalyAlertStageSpec extends SparkSpec {
  import spark.implicits._

  test("streamed 3-sigma alerts match batch e13's verdict on the same buckets") {
    implicit val sq = spark.sqlContext
    // baseline from the real event history
    val base = AnomalyAlertStage.baseline(Tables.events(spark, sf)).cache()
    assert(base.count() >= 2)

    // live traffic: a calm hour for every type, plus one engineered spike
    // far above any historical bucket (history max cnt + 10x mean)
    val stats = base.collect().map(r => r.getAs[String]("event_type") ->
      r.getAs[Long]("s") / r.getAs[Long]("n")).toMap
    val calmStart = 100L * 3600000L
    val spikeStart = 101L * 3600000L
    val spikeType = stats.keys.min
    val calm = stats.toSeq.flatMap { case (t, mean) =>
      (0L until math.max(1L, mean / 2)).map(i => (calmStart + i, t))
    }
    val spike = (0L until stats(spikeType) * 12L).map(i => (spikeStart + i, spikeType))

    val input = MemoryStream[(Long, String)]
    val events = input.toDF().toDF("ms", "event_type")
      .withColumn("ets", timestamp_millis(col("ms")))
    val query = AnomalyAlertStage.start(spark, events, base, "alerts")
    try {
      input.addData(calm)
      query.processAllAvailable()
      input.addData(spike)
      query.processAllAvailable()
      val alerts = spark.table("alerts").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
          r.getAs[String]("event_type"), r.getAs[Long]("cnt")))
      // exactly the spike bucket alerts; every calm bucket stays silent
      assert(alerts.map(a => (a._1, a._2)).toSet == Set((spikeStart, spikeType)),
        s"unexpected alert set: ${alerts.mkString(", ")}")
      assert(alerts.head._3 == stats(spikeType) * 12L)

      // the decision is bit-identical to the batch test on the same counts
      val d38 = "decimal(38,0)"
      val nD = col("n").cast(d38)
      val dev = nD * col("cnt").cast(d38) - col("s").cast(d38)
      val varNum = nD * col("q").cast(d38) - col("s").cast(d38) * col("s").cast(d38)
      val batchFlags = (calm ++ spike).toDF("ms", "event_type")
        .withColumn("hour_ms", col("ms") - col("ms") % 3600000L)
        .groupBy("event_type", "hour_ms").agg(count(lit(1)).as("cnt"))
        .join(base, "event_type")
        .filter(col("n") * col("cnt") > col("s") &&
                dev * dev * (nD - 1) > lit(9).cast(d38) * nD * varNum)
        .select("hour_ms", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(batchFlags == alerts.map(a => (a._1, a._2)).toSet)
    } finally query.stop()
  }
}
