package graft.tools

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Staleness gate for the committed plan_report.json artifact: the
  * report a reviewer greps must cover exactly the registered operator
  * surface. PlanAuditSpec audits LIVE plans at test time; this spec
  * fails the build the moment an operator lands (or is renamed) without
  * `sbt "runMain graft.tools.PlanReport <sfDir>"` being re-run — in
  * round 5 the report silently ran 2 keys behind the surface. */
class PlanReportSpec extends AnyFunSuite {

  test("plan_report.json covers exactly SparkEntry.queries' key set") {
    val path = java.nio.file.Paths.get("plan_report.json")
    assert(java.nio.file.Files.exists(path),
      "plan_report.json missing — run: sbt \"runMain graft.tools.PlanReport /root/testdata/sf0.01\"")
    val text = java.nio.file.Files.readString(path)
    // top-level keys: "<name>":{  — stat objects contain no nested braces
    val reported = """"([A-Za-z0-9_]+)":\{""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val expected = SparkEntry.queries.keySet
    val missing = expected -- reported
    val stale = reported -- expected
    assert(missing.isEmpty && stale.isEmpty,
      s"plan_report.json is stale — missing: ${missing.toSeq.sorted.mkString(", ")}; " +
        s"dropped operators still present: ${stale.toSeq.sorted.mkString(", ")}; " +
        "regenerate with: sbt \"runMain graft.tools.PlanReport /root/testdata/sf0.01\"")
  }
}
