package graft.tools

import graft.SparkSpec

/** Every operator's physical plan stays free of scale anti-patterns
  * (cartesians, non-allow-listed nested-loop joins, single-partition
  * windows) — a new operator can't silently reintroduce one. */
class PlanAuditSpec extends SparkSpec {
  test("no operator plans a cartesian, stray BNLJ, or global window") {
    val flagged = PlanAudit.audit(spark, sf)
    assert(flagged.isEmpty, flagged.map { case (n, r) => s"$n: $r" }.mkString("; "))
  }
}
