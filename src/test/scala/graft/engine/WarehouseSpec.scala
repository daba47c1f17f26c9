package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WarehouseSpec extends SparkSpec {

  test("day-partitioned layout prunes partitions for date filters") {
    val dir = Files.createTempDirectory("warehouse").toString
    val events = Warehouse.withDayPartition(Tables.events(spark, sf), "ms")
    Warehouse.writePartitioned(events, dir, Seq("dt"), Seq("user_id", "ms"))

    // directory structure is dt=YYYY-MM-DD
    val dts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("dt="))
    assert(dts.length >= 25, s"expected ~30 day dirs, got ${dts.length}")

    // a one-day filter must scan exactly that partition's files
    val oneDay = Warehouse.read(spark, dir).filter(col("dt") === "2024-01-05")
    val files = oneDay.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("dt=2024-01-05")),
      s"scan leaked outside the partition: ${files.take(3).mkString(",")}")

    // nothing lost on the round trip
    assert(Warehouse.read(spark, dir).count() == Tables.events(spark, sf).count())
  }

  test("compaction collapses per-trigger small files, preserving rows and layout") {
    val dir = Files.createTempDirectory("wh-compact").toString
    val events = Warehouse.withDayPartition(Tables.events(spark, sf), "ms")
    // simulate streaming ingestion: many tiny files per day partition
    events.repartition(16).write.mode("overwrite").partitionBy("dt").parquet(dir)
    def dataFiles(): Array[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("dt="))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    val before = dataFiles().length
    val rows = Warehouse.read(spark, dir).collect().map(_.toString).sorted
    Warehouse.compact(spark, dir, Seq("dt"), Seq("user_id", "ms"))
    val after = dataFiles().length
    assert(after < before / 4, s"compaction barely helped: $before -> $after files")
    // no rows lost or duplicated, partition dirs intact
    val got = Warehouse.read(spark, dir).collect().map(_.toString).sorted
    assert(got.sameElements(rows))
    // within-file sort survives (row-group skipping still works):
    // every file's (user_id, ms) sequence is non-decreasing
    import spark.implicits._
    val perFile = Warehouse.read(spark, dir)
      .select(input_file_name().as("f"), col("user_id"), col("ms"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    perFile.values.foreach { rs =>
      val seq = rs.map(r => (r._2, r._3)).toSeq
      assert(seq == seq.sorted, "within-file sort lost by compaction")
    }
  }

  test("compaction carries across files landed by a concurrent writer") {
    val dir = Files.createTempDirectory("wh-concurrent").toString
    val events = Warehouse.withDayPartition(Tables.events(spark, sf), "ms")
    events.repartition(8).write.mode("overwrite").partitionBy("dt").parquet(dir)
    val base = Warehouse.read(spark, dir).count()
    // a "streaming sink" commits one more file AFTER compact's snapshot —
    // the seam fires between the rewrite and the swap, the worst window
    val lateDir = Files.createTempDirectory("wh-late").toString
    events.filter(col("dt") === "2024-01-05").limit(7).drop("dt")
      .coalesce(1).write.mode("overwrite").parquet(lateDir)
    val part = new java.io.File(lateDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Warehouse.compact(spark, dir, Seq("dt"), Seq("user_id", "ms"),
      onBeforeSwap = () => {
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(dir, "dt=2024-01-05", "late-" + part.getName))
      })
    assert(Warehouse.read(spark, dir).count() == base + 7,
      "late-committed rows were destroyed by compaction")
    assert(!new java.io.File(dir + ".compact-old").exists(),
      "backup must be cleaned once the new dir is verified in place")
    assert(!new java.io.File(dir + ".compact-tmp").exists())
  }

  test("bucketed fact-fact join on the bucket key plans with zero shuffle") {
    Warehouse.writeBucketed(Tables.orders(spark, sf), "wh_orders_b",
      "o_orderkey", nBuckets = 4)
    Warehouse.writeBucketed(Tables.lineitem(spark, sf), "wh_lineitem_b",
      "l_orderkey", nBuckets = 4)
    try {
      // force the shuffle-join path (broadcast would hide the question)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wh_lineitem_b")
        .join(spark.table("wh_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
      val n = joined.collect().length
      assert(n >= 1)
      val plan = joined.queryExecution.executedPlan.toString
      // bucketing co-locates both sides: the JOIN itself needs no Exchange;
      // only the final small groupBy aggregation may shuffle
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join over bucketed scans:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and the unbucketed form of the same join DOES shuffle both sides
      val unbucketed = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("qty"))
      unbucketed.collect()
      val uPlan = unbucketed.queryExecution.executedPlan.toString
      assert(uPlan.split("HashAggregate").last.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS wh_orders_b")
      spark.sql("DROP TABLE IF EXISTS wh_lineitem_b")
    }
  }
}
