package graft.streaming

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.engine.Warehouse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CompactingSinkSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(root: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.walk(p)
      try s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
      finally s.close()
    }
  }

  test("micro-batches append, periodic compact shrinks files, zero rows lost") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("compacting-sink").toString + "/wh"
    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ms", "value")
    val query = events.writeStream
      .foreachBatch(CompactingSink.handler(dir, compactEvery = 3L, targetRows = 1000000L))
      .option("checkpointLocation", Files.createTempDirectory("compacting-ckpt").toString)
      .start()
    try {
      val day = 1704067200000L // 2024-01-01, keeps every row in one dt partition
      // four micro-batches of 3 rows; compaction fires at batchId 3
      for (b <- 0 until 4) {
        input.addData((1 to 3).map(i => (i.toLong, day + b * 1000L + i, b * 10.0 + i)): _*)
        query.processAllAvailable()
      }
      val files = parquetFiles(dir)
      // 4 appended trigger-files collapsed to 1 per partition by the
      // batchId-3 compact, plus at most the single post-compact append
      assert(files.size <= 2, s"expected <=2 files after compact, saw ${files.size}")
      val back = Warehouse.read(spark, dir)
      assert(back.count() == 12L)
      // values intact (sum is injective enough for this fixed input)
      val expected = (0 until 4).flatMap(b => (1 to 3).map(i => b * 10.0 + i)).sum
      assert(math.abs(back.agg(org.apache.spark.sql.functions.sum("value"))
        .head().getDouble(0) - expected) < 1e-9)
    } finally query.stop()
  }
}
