package graft.operators

import graft.SparkSpec

/** Independent check of e48's Gini machinery.
  *
  * The operator never ranks users: it reconstructs each tie-group's
  * rank-block mass arithmetically over the distinct-count frame (the
  * piece subtle enough to get silently wrong in four different ways —
  * off-by-one in the rank block, halved tie mass, wrong prefix side,
  * band-offset misjoin). The DuckDB oracle is one independent
  * implementation; this spec is a THIRD, by the textbook definition:
  * sort the per-user counts, Σ i·x_(i) in BigInt, G = (2W−(n+1)S)/(nS).
  * All three must agree to the 1e-6 quantum on the real table.
  */
class GiniSpec extends SparkSpec {

  private def bruteGini(xs: Seq[Long]): Double = {
    val sorted = xs.sorted
    val n = BigInt(sorted.size)
    val s = sorted.foldLeft(BigInt(0))(_ + _)
    val w = sorted.zipWithIndex.foldLeft(BigInt(0)) {
      case (acc, (x, i)) => acc + BigInt(i + 1) * x
    }
    ((BigInt(2) * w - (n + 1) * s).toDouble / (n * s).toDouble)
  }

  test("e48 equals the sorted-rank textbook Gini on the real events table") {
    val got = Events.e48(spark, sf).head()
    val counts = graft.engine.Tables.events(spark, sf)
      .groupBy("user_id").count()
      .collect().map(_.getLong(1)).toSeq
    assert(got.getLong(0) == counts.size.toLong, "n_users")
    assert(got.getLong(1) == counts.sum, "total_events")
    val expected = BigDecimal(bruteGini(counts))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.getDouble(2) - expected) < 1e-9,
      s"gini ${got.getDouble(2)} != brute $expected")
  }

  test("tie-heavy synthetic distribution: uniform counts give Gini 0") {
    // every user has the same count → perfectly equal → G = 0 exactly
    val xs = Seq.fill(97)(5L)
    assert(math.abs(bruteGini(xs)) < 1e-12)
  }

  test("whale-dominated synthetic distribution approaches 1") {
    val xs = Seq.fill(999)(1L) :+ 1000000L
    val g = bruteGini(xs)
    assert(g > 0.99 && g <= 1.0, s"whale Gini was $g")
  }
}
