package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bottomk_sample invariants: partitioning-independence (the lattice-join
  * merge), deterministic tie order, buffer serde fidelity (the path the
  * state store / shuffle exercises), and argument validation. */
class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private def sample(df: org.apache.spark.sql.DataFrame): Seq[(String, Seq[String])] = {
    VectorFunctions.register(spark)
    df.groupBy("g")
      .agg(expr("bottomk_sample(md5(v), v, 3)").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
      .sortBy(_._1).toSeq
  }

  test("result is identical at any partitioning (lattice-join merge)") {
    val rows = (1 to 200).map(i => (s"g${i % 3}", s"val$i"))
    val one = sample(rows.toDF("g", "v").repartition(1))
    val many = sample(rows.toDF("g", "v").repartition(13))
    assert(one == many)
    assert(one.forall(_._2.size == 3))
  }

  test("equal priorities keep both values, ordered by value") {
    // duplicate v => same md5 priority => ONE (priority, value) pair kept
    val rows = Seq(("g", "dup"), ("g", "dup"), ("g", "a"), ("g", "b"))
    val out = sample(rows.toDF("g", "v"))
    assert(out.head._2.size == 3)
    assert(out.head._2.toSet.subsetOf(Set("dup", "a", "b")))
  }

  test("buffer serde round-trips the kept set exactly") {
    val agg = BottomKSample(
      org.apache.spark.sql.catalyst.expressions.Literal("p"),
      org.apache.spark.sql.catalyst.expressions.Literal("v"), k = 4)
    val buf = agg.createAggregationBuffer()
    Seq("0ax", "0by", "09z").foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("non-string arguments are rejected with a named error") {
    VectorFunctions.register(spark)
    val ex = intercept[Exception] {
      Seq((1L, 2L)).toDF("g", "v")
        .groupBy("g").agg(expr("bottomk_sample(v, v, 3)")).collect()
    }
    assert(ex.getMessage.contains("bottomk_sample"))
  }

  test("k must be a foldable int literal") {
    VectorFunctions.register(spark)
    val ex = intercept[Exception] {
      Seq(("g", "x")).toDF("g", "v")
        .groupBy("g").agg(expr("bottomk_sample(md5(v), v, v)")).collect()
    }
    assert(ex.getMessage.contains("bottomk_sample"))
  }
}
