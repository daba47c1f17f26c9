package graft.tools

/** Dev tool: bench a named subset of SparkEntry.queries N times (default
  * 3) at SPARK_GRAFT_SF_DIR, printing each run's per-query seconds — the
  * quiet-box regression harness for chasing individual bench movements
  * without paying for the full 218-query sweep. */
object BenchFew {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchFew <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val unknown = args.toSet.diff(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.engine.Engine.session(cpus, "graft-bench-few")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM/codegen warm
    val qs = graft.SparkEntry.queries.filter(kv => args.contains(kv._1)).toSeq.sortBy(_._1)
    (1 to runs).foreach { i =>
      val (res, failed, _, probes) = graft.Bench.run(spark, sfDir, qs)
      println(s"[benchfew] run$i: " +
        res.map { case (n, v) =>
          f"$n=$v%.2f(probe=${probes.getOrElse(n, 0.0)}%.2f)"
        }.mkString(" ") +
        (if (failed.nonEmpty) s" FAILED=${failed.mkString(",")}" else ""))
    }
    spark.stop()
  }
}
