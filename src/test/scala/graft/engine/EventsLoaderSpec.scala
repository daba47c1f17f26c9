package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Runtime-drift guard for the events loader.
  *
  * Round 4 post-mortem: the container's Spark moved 4.0→4.1.2 between
  * rounds, `spark.sql.legacy.parquet.nanosAsLong` became a silent no-op
  * (conf.set still succeeds — it is ignored by the parquet reader, so
  * drift can only be detected on the RESOLVED column type), events `ts`
  * started resolving as TIMESTAMP_NTZ, and all 47 event queries died at
  * analysis time with no single test naming the cause. This suite is
  * that test: if the parquet type resolution drifts again, these
  * assertions fail loudly with the loader named, instead of 19 opaque
  * reds scattered across unrelated suites.
  */
class EventsLoaderSpec extends SparkSpec {
  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events yields BIGINT ms + TIMESTAMP ets at every scale (drift guard)") {
    sfDirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      val resolved = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(Seq(LongType, TimestampNTZType, TimestampType).contains(resolved),
        s"$dir: events.ts resolved as $resolved — new Spark parquet-timestamp " +
          "behavior; extend Tables.events before anything else this round")
      assert(ev.schema("ms").dataType == LongType, s"$dir: ms must be BIGINT")
      assert(ev.schema("ets").dataType == TimestampType, s"$dir: ets must be TIMESTAMP")
    }
  }

  test("ms is bit-identical to the physical int64 epoch at every scale") {
    // The parquet timestamp column is physically INT64 whatever its
    // logical annotation (NANOS in rounds 1-3's testdata, MICROS now);
    // a user-supplied LongType schema reads that int64 directly on every
    // Spark version, independent of logical-type resolution. Sniff the
    // unit from magnitude (2024 epochs: micros ~1.7e15, nanos ~1.7e18)
    // so this guard survives the driver regenerating the data in either
    // unit, then require the loader's ms to be the exact floor-division
    // — that is the DuckDB epoch_ms(ts) the oracles compare against.
    sfDirs.foreach { dir =>
      val raw0 = spark.read
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType))))
        .parquet(s"$dir/events.parquet")
      val sample = raw0.select(max("ts")).head().getLong(0)
      val perMs = if (sample > 1e17.toLong) 1000000L else 1000L
      val raw = raw0.select(col("event_id"), expr(s"ts div $perMs").as("raw_ms"))
      val loaded = Tables.events(spark, dir).select(col("event_id"), col("ms"))
      val bad = loaded.join(raw, "event_id")
        .where(col("ms") =!= col("raw_ms") || col("ms").isNull).count()
      assert(bad == 0, s"$dir: $bad rows where loader ms != floor(raw_int64/$perMs)")
    }
  }

  test("known epoch anchors match DuckDB epoch_ms (sf0.001)") {
    // Pinned from `SELECT min(epoch_ms(ts)), max(epoch_ms(ts)), count(*)`
    // in DuckDB against the same file — the oracle side of every event
    // query. If these move, the testdata or the decode path changed.
    val r = Tables.events(spark, "/root/testdata/sf0.001")
      .agg(min("ms"), max("ms"), count(lit(1)), min("ets")).head()
    assert(r.getLong(2) == 1000L, "sf0.001 events row count")
    assert(r.getLong(0) == 1704067798778L, s"min ms drifted: ${r.getLong(0)}")
    assert(r.getLong(1) == 1706657176220L, s"max ms drifted: ${r.getLong(1)}")
    assert(r.getTimestamp(3).toInstant.toEpochMilli == 1704067798778L,
      "ets must be the ms-truncated timestamp of the same instant (UTC)")
  }
}
