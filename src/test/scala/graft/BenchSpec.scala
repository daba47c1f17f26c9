package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver parses the bench JSON from the LAST ~2000 chars of stdout
  * (BENCH_r01/r02 both captured a 2000-char tail and recorded
  * parsed: null when the full per-query map overflowed it). These tests
  * pin the compact-line contract: always a single valid JSON object,
  * always under the window even with sbt's trailing "[success]" line. */
class BenchSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.1"
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
}
