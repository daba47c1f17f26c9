package graft.tools

import graft.SparkEntry
import graft.engine.Engine

/** Dev tool: print the formatted physical plan (and optionally time) for
  * named queries. Usage: runMain graft.tools.Explain <sfDir> <name> [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val time = args.length > 2 && args(2) == "time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cpus, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    if (time) { // warm JVM/codegen so timings reflect the engine
      spark.range(1000000L).selectExpr("sum(id)").collect()
      SparkEntry.entry(spark).count()
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      if (time) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[time] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
