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
