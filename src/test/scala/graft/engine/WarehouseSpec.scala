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
}
