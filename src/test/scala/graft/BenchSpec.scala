package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** The driver parses the bench JSON from the LAST ~2000 chars of stdout
  * (BENCH_r01/r02 both captured a 2000-char tail and recorded
  * parsed: null when the full per-query map overflowed it). These tests
  * pin the compact-line contract: always a single valid JSON object,
  * always under the window even with sbt's trailing "[success]" line —
  * and, since round 4 (47 broken queries benched as an innocent fast
  * tail), that failures are named in both artifacts. */
class BenchSpec extends SparkSpec {
  // `sf` (the dir label in the JSON + the injected-run input) comes from
  // SparkSpec; the compact-line assertions are scale-independent.
  private val mapper = new ObjectMapper()

  test("compact line fits the driver's 2000-char stdout tail window") {
    val results = (1 to 250).map(i => (f"q$i%03d_some_operator_name", i * 0.017))
    val line = Bench.compactLine(results, sf)
    assert(line.length <= 1800, s"line too long: ${line.length}")
    val node = mapper.readTree(line) // must be valid JSON
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("sf").asText() == sf)
    // total reflects EVERY query, not just the individually named ones
    assert(math.abs(node.get("value").asDouble() - results.map(_._2).sum) < 0.01)
    val qs = node.get("queries")
    // slowest entry is named; the fast tail is collapsed, not dropped
    assert(qs.has("q250_some_operator_name"))
    assert(qs.has("_rest"))
    var namedSum = 0.0
    qs.properties().forEach(e => namedSum += e.getValue.asDouble())
    assert(math.abs(namedSum - results.map(_._2).sum) < 0.5,
      "named + _rest must re-add to the total (3-decimal rounding slack)")
  }

  test("small result sets are emitted in full with no rest bucket") {
    val line = Bench.compactLine(Seq(("a", 1.0), ("b", 2.0)), sf)
    val node = mapper.readTree(line)
    assert(!node.get("queries").has("_rest"))
    assert(node.get("queries").get("a").asDouble() == 1.0)
    assert(node.get("value").asDouble() == 3.0)
  }

  test("the REAL query surface fits the window") {
    val results = SparkEntry.queries.keys.toSeq.map(k => (k, 0.543))
    val line = Bench.compactLine(results, sf)
    assert(line.length <= 1800, s"real surface overflows: ${line.length}")
    assert(mapper.readTree(line).get("queries").size() >= 40,
      "window should still name dozens of queries individually")
  }

  test("failures are named in the compact line and survive the tail window") {
    // worst realistic case: the whole 47-key event family breaks at once
    // (round 4) while every other query still posts a timing
    val results = SparkEntry.queries.keys.toSeq.map(k => (k, 0.543))
    val failed = SparkEntry.queries.keys.filter(_.startsWith("e")).toSeq
    assert(failed.size >= 40, "test premise: event family is the big failure set")
    val line = Bench.compactLine(results, sf, failed)
    assert(line.length <= 1800, s"line with failures overflows: ${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("failed_count").asInt() == failed.size)
    assert(node.get("failed").size() >= 10,
      "at least the head of the failed list must be named, not just counted")
    assert(node.get("queries").size() >= 10,
      "failure reserve must not crowd out the per-query timings entirely")
  }

  test("clean runs emit no failed fields (artifact shape unchanged)") {
    val node = mapper.readTree(Bench.compactLine(Seq(("a", 1.0)), sf))
    assert(!node.has("failed") && !node.has("failed_count"))
  }

  test("an injected failing query is reported by run(), not benched silently") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).toDF("id")
    val boom: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).toDF("id").selectExpr("no_such_column + 1")
    val (results, failed, runs, probes) = Bench.run(spark, sf, Seq("good" -> ok, "bad" -> boom))
    assert(failed == Seq("bad"))
    assert(results.map(_._1) == Seq("good", "bad"))
    // every query carries both raw samples and the reported value is
    // their min — the noise-auditing contract bench_full.json ships
    assert(runs.keySet == Set("good", "bad"))
    runs.foreach { case (n, rs) =>
      assert(rs.size == 2 && results.toMap.apply(n) == rs.min)
    }
    // the contention probe ran once per query and lands in bench_full
    assert(probes.keySet == Set("good", "bad"))
    assert(probes.valuesIterator.forall(_ > 0.0))
    val full = mapper.readTree(Bench.fullLine(results, sf, failed, runs, probes))
    assert(full.get("failed").get(0).asText() == "bad")
    assert(full.get("n_runs").asInt() == 2)
    assert(full.get("runs").get("good").size() == 2)
    assert(full.get("probe").get("good").asDouble() > 0.0)
  }
}
