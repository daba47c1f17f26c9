package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scan every operator's physical plan for scale anti-patterns
  * (cartesian products, unexpected nested-loop joins, single-partition
  * windows). Runs as a dev tool (main) and as a regression spec
  * (PlanAuditSpec) so a new operator can't silently reintroduce one.
  *
  * Allow-listed BroadcastNestedLoopJoins — every one has a PROVABLY
  * bounded build side:
  *  - s03/s04: vector x k-centroid ranking pass (model broadcast, k<=16)
  *  - d05: the exact all-pairs BASELINE (non-equi vec_a < vec_b pair
  *    condition); its scale path is d07
  *  - e05: k x k rank self-join AFTER limit(10)
  *  - q16: scalar-subquery compare against a 1-row aggregate
  *  - q23: month-frame range self-join (one row per calendar month)
  */
object PlanAudit {
  private val allowBnlj = Set(
    "s03_ann_ivf", "s04_ann_ivfpq", "d05_embedding_neardup",
    "e05_top_users", "q16_scalar_subquery", "q23_moving_avg")

  /** Returns flagged (name, reason) pairs; empty = clean. */
  def audit(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = try q(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Exception => s"PLAN-ERROR ${e.getMessage}" }
      val reasons = Seq(
        "cartesian" -> plan.contains("CartesianProduct"),
        "bnlj" -> (plan.contains("BroadcastNestedLoopJoin") && !allowBnlj(name)),
        "singlePartitionWindow" -> (plan.contains("Window") && plan.contains("SinglePartition")),
        "planError" -> plan.startsWith("PLAN-ERROR"),
      ).collect { case (r, true) => r }
      if (reasons.isEmpty) Nil else Seq(name -> reasons.mkString("+"))
    }

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Engine.session(8, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = audit(spark, args(0))
    flagged.foreach { case (n, r) => println(s"[audit] $n: $r") }
    println(s"[audit] done, ${flagged.size} flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
