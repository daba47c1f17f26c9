package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the KmvDistinct TypedImperativeAggregate that the e103
  * oracle row can't pin by itself: exactness below k, partitioning
  * independence (the lattice-join merge), and the estimator's error
  * behavior above k. */
class KmvDistinctSpec extends SparkSpec {

  test("below k the sketch is exact and deterministic") {
    VectorFunctions.register(spark)
    val df = spark.range(0L, 40L).selectExpr("id % 7 as g", "id as u")
    val r = df.groupBy("g").agg(expr("kmv_distinct(u, 64)").as("s"))
      .selectExpr("g", "s.n_kept as n", "s.est_distinct as est")
      .collect()
    assert(r.length == 7)
    r.foreach { row =>
      assert(row.getAs[Long]("n") == row.getAs[Double]("est").toLong)
    }
    val exact = df.groupBy("g").agg(countDistinct("u").as("c")).collect()
      .map(x => x.getAs[Long]("g") -> x.getAs[Long]("c")).toMap
    r.foreach(row => assert(row.getAs[Long]("n") == exact(row.getAs[Long]("g"))))
  }

  test("estimate is independent of partitioning and row order") {
    VectorFunctions.register(spark)
    val base = spark.range(0L, 5000L).selectExpr("id * 2654435761 % 100000 as u")
    def est(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val r = df.agg(expr("kmv_distinct(u, 64)").as("s"))
        .selectExpr("s.n_kept", "s.kth_hash", "s.est_distinct").collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val a = est(base.repartition(1))
    val b = est(base.repartition(17))
    val c = est(base.orderBy(desc("u")).repartition(5))
    assert(a == b && b == c, s"merge-order dependence: $a / $b / $c")
  }

  test("above k the estimator lands within the 3-sigma KMV envelope") {
    VectorFunctions.register(spark)
    val n = 2000L
    val df = spark.range(0L, n).selectExpr("id as u")
    val r = df.agg(expr("kmv_distinct(u, 64)").as("s"))
      .selectExpr("s.n_kept", "s.est_distinct").collect()(0)
    assert(r.getLong(0) == 64L)
    val rse = 1.0 / math.sqrt(62.0) // ~ 1/sqrt(k-2)
    val rel = math.abs(r.getDouble(1) - n.toDouble) / n.toDouble
    assert(rel <= 3 * rse, s"relative error $rel beyond 3x${rse}")
    // documented operating range (SketchAggregates scaladoc / SCALE.md):
    // estimates degrade approaching p = 2^31-1; every cardinality this
    // suite and e103 exercise sits orders of magnitude inside the
    // <= 1e8 per-group bound
    assert(n < 100000000L)
  }

  test("integral input types widen; non-integral input is a clear analysis error") {
    VectorFunctions.register(spark)
    // INT column: round 6 this threw ClassCastException at runtime
    val ints = spark.range(0L, 30L).selectExpr("CAST(id AS INT) AS u")
    val ri = ints.agg(expr("kmv_distinct(u, 64)").as("s"))
      .selectExpr("s.n_kept").collect()(0)
    assert(ri.getLong(0) == 30L)
    // negative ids: floorMod keeps hashes in [0, P) so the estimator
    // stays sane (a sign-preserving % yielded negative hashes that
    // collapsed the k-th minimum)
    val neg = spark.range(0L, 3000L).selectExpr("-(id + 1) AS u")
    val rn = neg.agg(expr("kmv_distinct(u, 64)").as("s"))
      .selectExpr("s.kth_hash", "s.est_distinct").collect()(0)
    assert(rn.getLong(0) > 0L)
    val rel = math.abs(rn.getDouble(1) - 3000.0) / 3000.0
    assert(rel <= 3.0 / math.sqrt(62.0), s"negative-id estimate off: $rn")
    // non-integral input: named analysis failure, not a runtime CCE
    val strs = spark.range(0L, 5L).selectExpr("CAST(id AS STRING) AS u")
    val e = intercept[Exception](
      strs.agg(expr("kmv_distinct(u, 64)")).collect())
    assert(e.getMessage.contains("integral") || e.getMessage.contains("TINYINT"),
      s"unhelpful error: ${e.getMessage}")
  }

  test("k argument accepts any integral literal and rejects bad shapes by name") {
    VectorFunctions.register(spark)
    val df = spark.range(0L, 30L).selectExpr("id AS u")
    // BIGINT literal k: round 6 this threw ClassCastException
    val rl = df.agg(expr("kmv_distinct(u, CAST(64 AS BIGINT))").as("s"))
      .selectExpr("s.n_kept").collect()(0)
    assert(rl.getLong(0) == 30L)
    // non-foldable k names the argument contract instead of an NPE
    val e1 = intercept[Exception](
      df.agg(expr("kmv_distinct(u, u)")).collect())
    assert(e1.getMessage.contains("kmv_distinct") &&
      e1.getMessage.contains("foldable"), s"unhelpful error: ${e1.getMessage}")
    // non-integer literal k
    val e2 = intercept[Exception](
      df.agg(expr("kmv_distinct(u, 'x')")).collect())
    assert(e2.getMessage.contains("kmv_distinct"),
      s"unhelpful error: ${e2.getMessage}")
  }
}
