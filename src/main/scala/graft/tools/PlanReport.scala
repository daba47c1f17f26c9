package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Plan inventory: one JSON row per query with the physical-plan stats
  * the scale audit argues from — shuffle count, scan count and whether
  * every scan prunes columns, join kinds, window count, codegen span
  * count. Complements PlanAudit (which flags anti-patterns) with the
  * raw counts, so "one shuffle, dims broadcast" claims in SCALE.md are
  * checkable against an artifact instead of prose.
  *
  * Operator counts parse the EXECUTED plan string (the same source
  * PlanAudit matches on) because the typed sparkPlan tree is
  * pre-EnsureRequirements — exchanges and WholeStageCodegen nodes only
  * exist after preparations, and AQE hides its subtree from collect().
  * Scan column-pruning uses the typed pre-AQE tree, where
  * FileSourceScanExec is reachable.
  *
  * Usage: `sbt "runMain graft.tools.PlanReport <sfDir> [outFile]"`.
  */
object PlanReport {
  final case class Stats(shuffles: Int, bcasts: Int, scans: Int,
                         prunedScans: Int, smj: Int, bhj: Int, bnlj: Int,
                         windows: Int)

  def stats(sparkPlan: SparkPlan, executedStr: String): Stats = {
    def cnt(re: String): Int = re.r.findAllMatchIn(executedStr).size
    val scans = sparkPlan.collect { case s: FileSourceScanExec => s }
    Stats(
      shuffles = cnt("""Exchange (hash|range|Single)"""),
      bcasts = cnt("""BroadcastExchange"""),
      scans = scans.size,
      prunedScans = scans.count(s =>
        s.requiredSchema.length < s.relation.dataSchema.length),
      smj = cnt("""SortMergeJoin"""),
      bhj = cnt("""BroadcastHashJoin"""),
      bnlj = cnt("""BroadcastNestedLoopJoin"""),
      windows = cnt("""\bWindow(GroupLimit)? """))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = if (args.length > 1) args(1) else "plan_report.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.engine.Engine.session(cpus, "graft-plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      val qe = q(spark, sfDir).queryExecution
      val s = stats(qe.sparkPlan, qe.executedPlan.toString)
      s""""$name":{"shuffles":${s.shuffles},"bcasts":${s.bcasts},""" +
        s""""scans":${s.scans},"pruned_scans":${s.prunedScans},""" +
        s""""smj":${s.smj},"bhj":${s.bhj},"bnlj":${s.bnlj},""" +
        s""""windows":${s.windows}}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      rows.mkString("{", ",\n", "}\n"))
    println(s"[planreport] ${rows.size} queries -> $out")
    spark.stop()
  }
}
