package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: run one named query twice (cold + warm) and print per-job and
  * per-stage wall times, so "which of the ~10 tiny jobs eats the 2s" is
  * answerable without the UI. Usage: runMain graft.tools.JobProfile <sfDir> <name>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Engine.session(cpus, "graft-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.SparkEntry.entry(spark).count()
    // the listener-bus thread writes these while the main thread clears
    // and reads them — all access goes through `jobs.synchronized` (one
    // lock for all three; contention is nil for a dev tool)
    val jobs = scala.collection.mutable.LinkedHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.LinkedHashMap[Int, Long]()
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        jobs(js.jobId) = (js.time, Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        done(je.jobId) = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val detail = f"run=${m.executorRunTime / 1000.0}%.2f " +
          f"cpu=${m.executorCpuTime / 1e9}%.2f deser=${m.executorDeserializeTime / 1000.0}%.2f " +
          f"gc=${m.jvmGCTime / 1000.0}%.2f sub=${si.submissionTime.getOrElse(0L)}"
        jobs.synchronized {
          stages += ((si.stageId,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks, detail + "  " + si.name.split("\n").head.take(60)))
        }
      }
    })
    (1 to 2).foreach { run =>
      jobs.synchronized { jobs.clear(); done.clear(); stages.clear() }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // let the listener bus drain before reading (listenerBus is
      // private[spark]; the sleep is best-effort but reads are now
      // synchronized so a slow drain can no longer corrupt the maps)
      Thread.sleep(300)
      jobs.synchronized {
        println(f"== run$run $name total=$total%.2fs jobs=${done.size} stages=${stages.size}")
        jobs.foreach { case (id, (t0j, desc)) =>
          done.get(id).foreach { t1 =>
            println(f"  job $id%3d ${(t1 - t0j) / 1000.0}%6.2fs  $desc")
          }
        }
        stages.sortBy(-_._2).take(12).foreach { case (id, ms, nt, nm) =>
          println(f"  stage $id%4d ${ms / 1000.0}%6.2fs tasks=$nt%3d  $nm")
        }
      }
    }
    spark.stop()
  }
}
