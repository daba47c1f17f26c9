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
  }
}
