package graft.plans

import graft.SparkSpec
import graft.engine.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class CosineTopKSpec extends SparkSpec {

  test("custom exec equals the composed join+window form bit-for-bit") {
    VectorFunctions.register(spark)
    if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineTopKStrategy

    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("v"), expr("vec_norm(embedding)").as("nrm"))
    val q = e.select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nb"))

    val custom = CosineTopK(spark, q, n, k = 5)
      .orderBy("q_id", "rnk", "n_id").collect()

    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val composed = q.join(broadcast(n), col("q_id") =!= col("n_id"))
      .withColumn("cos", round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("q_id", "n_id", "rnk", "cos")
      .orderBy("q_id", "rnk", "n_id").collect()

    assert(custom.length == composed.length && custom.length == 2500)
    custom.zip(composed).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(2) == b.getLong(2))
      assert(java.lang.Double.doubleToLongBits(a.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(3)))
    }
  }

  test("k larger than the neighbor count returns all neighbors ranked") {
    VectorFunctions.register(spark)
    if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineTopKStrategy
    val e = Tables.embeddings(spark, sf).limit(3)
      .select(col("vec_id"), col("embedding").as("v"), expr("vec_norm(embedding)").as("nrm"))
    val q = e.select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("na"))
    val n = e.select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nb"))
    val out = CosineTopK(spark, q, n, k = 10).collect()
    assert(out.length == 6) // 3 queries x 2 other neighbors
  }
}
