package graft.tools

import org.apache.spark.sql.functions._
import graft.Graft
import graft.engine.Engine
import graft.operators.SkewUtils

/** Demo of the user-facing surface: register the warehouse, query with
  * plain SQL (including graft's vector functions), dispatch a named
  * operator, and run a salted aggregation over a skewed key.
  * Run: sbt "runMain graft.tools.SqlDemo [sfDir]"
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Engine.session(8, "graft-sql-demo")
    spark.sparkContext.setLogLevel("ERROR")

    Graft.registerViews(spark, dir)
    println("=== SQL over registered views ===")
    spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1""".stripMargin).show()

    println("=== vector functions from SQL ===")
    spark.sql(
      """SELECT a.vec_id, b.vec_id AS other,
        |  ROUND(vec_dot(a.embedding, b.embedding)
        |        / (vec_norm(a.embedding) * vec_norm(b.embedding)), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id LIMIT 3""".stripMargin).show()

    println("=== named operator dispatch ===")
    Graft.run(spark, dir, "e05_top_users").show(3)

    println("=== salted aggregation over skewed events ===")
    SkewUtils.saltedCountSum(
      spark.table("events"), col("user_id"), col("value"), salts = 8)
      .orderBy(desc("n")).show(3)

    spark.stop()
  }
}
