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

  test("the audit also holds at sf0.1 (size-dependent planning)") {
    // plans are not scale-invariant: statistics drive broadcast
    // decisions and cost-based fallbacks (d07 switches to its exact
    // baseline when the LSH table count blows the budget — a shape the
    // sf0.001 audit never sees). Analysis-only: no query executes.
    val flagged = PlanAudit.audit(spark, "/root/testdata/sf0.1")
    assert(flagged.isEmpty, flagged.map { case (n, r) => s"$n: $r" }.mkString("; "))
  }
}
