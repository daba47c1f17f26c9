package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: print the formatted physical plan (and optionally time) for
  * named queries. Usage: runMain graft.tools.Explain <sfDir> <name> [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val time = args.length > 2 && args(2) == "time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
