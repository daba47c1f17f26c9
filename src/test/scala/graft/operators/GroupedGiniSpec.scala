package graft.operators

import graft.SparkSpec

/** Independent check of the GROUPED Gini machinery (q72 per-segment
  * order values, t42 per-language word frequencies).
  *
  * The grouped variant adds two failure modes on top of e48's: a
  * band-offset row joined to the wrong group, and a window partition
  * leaking rows across groups. The DuckDB oracle is one independent
  * implementation; this spec is a third — per group, sort the raw
  * values, Σ i·x_(i) in BigInt, G = (2W−(n+1)S)/(nS) — run against the
  * real tables at sf0.001.
  */
class GroupedGiniSpec extends SparkSpec {

  private def bruteGini(xs: Seq[Long]): Double = {
    val sorted = xs.sorted
    val n = BigInt(sorted.size)
    val s = sorted.foldLeft(BigInt(0))(_ + _)
    val w = sorted.zipWithIndex.foldLeft(BigInt(0)) {
      case (acc, (x, i)) => acc + BigInt(i + 1) * x
    }
    ((BigInt(2) * w - (n + 1) * s).toDouble / (n * s).toDouble)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q72 equals the sorted-rank textbook Gini per segment") {
    import org.apache.spark.sql.functions._
    import graft.engine.Qf.dec
    val got = Relational.q72(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val cents = graft.engine.Tables.orders(spark, sf)
      .join(graft.engine.Tables.customer(spark, sf).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (dec(col("o_totalprice")) * 100).cast("decimal(38,0)").cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet == cents.keySet, "segment sets differ")
    cents.foreach { case (seg, xs) =>
      assert(got(seg)._1 == xs.size.toLong, s"$seg n_orders")
      val expected = round6(bruteGini(xs))
      assert(math.abs(got(seg)._2 - expected) < 1e-9,
        s"$seg gini ${got(seg)._2} != brute $expected")
    }
  }

  test("t42 equals the sorted-rank textbook Gini per language") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.t42(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val tf = graft.engine.Tables.documents(spark, sf)
      .select(col("lang"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
      .groupBy("lang", "w").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet == tf.keySet, "language sets differ")
    tf.foreach { case (lang, xs) =>
      assert(got(lang)._1 == xs.size.toLong, s"$lang vocab")
      val expected = round6(bruteGini(xs))
      assert(math.abs(got(lang)._2 - expected) < 1e-9,
        s"$lang gini ${got(lang)._2} != brute $expected")
    }
  }
}
