package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountSum equals plain groupBy on a skewed distribution") {
    // user 1 is the hot key: 10k rows; others have a handful
    val hot = (1 to 10000).map(i => (1L, i.toDouble))
    val cold = (2L to 50L).flatMap(u => Seq((u, 1.0), (u, 2.0)))
    val df = (hot ++ cold).toDF("user_id", "value").repartition(8)

    val salted = SkewUtils.saltedCountSum(df, col("user_id"), col("value"), salts = 16)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val plain = df.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)

    assert(salted.map(t => (t._1, t._2)).sameElements(plain.map(t => (t._1, t._2))))
    // double sums: salting changes addition order; compare within fp noise
    salted.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s._3 - p._3) < 1e-6 * math.max(1.0, math.abs(p._3)))
    }
  }

  test("saltedJoin matches a plain join result set") {
    val left = ((1 to 1000).map(_ => (7L, "hot")) ++ Seq((8L, "cold"), (9L, "unmatched")))
      .toDF("k", "tag").repartition(8)
    val right = Seq((7L, "seven"), (8L, "eight"), (10L, "ten")).toDF("k", "name")

    val salted = SkewUtils.saltedJoin(left, right, "k", salts = 8)
      .groupBy("k", "name").count().as[(Long, String, Long)].collect().sortBy(_._1)
    val plain = left.join(right, "k")
      .groupBy("k", "name").count().as[(Long, String, Long)].collect().sortBy(_._1)
    assert(salted.sameElements(plain))
  }
}
