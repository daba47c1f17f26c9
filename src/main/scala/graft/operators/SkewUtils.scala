package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for the 100 TB path.
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime, but two
  * shapes still need explicit salting on real pipelines:
  *
  *  1. broadcast-side-too-big joins where one hot key floods a task, and
  *  2. high-cardinality-per-key aggregations (e.g. count events for one
  *     viral user) where a single reduce partition melts.
  *
  * Both transforms are pure DataFrame rewrites — Catalyst still owns the
  * physical plan.
  */
object SkewUtils {
  /** Salted two-phase aggregation: partial-aggregate on (key, salt) —
    * spreading one hot key over `salts` reducers — then merge partials.
    * `partials` maps each value column to its partial-agg expression;
    * `merge` combines the partial columns to finals. Example:
    * {{{
    * saltedCountSum(events, col("user_id"), col("value"), 32)
    * }}}
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy("key")
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))

  /** Salted broadcast-replicated join for a skewed left key column:
    * the left side gets a random salt in [0, salts); the (small) right
    * side is exploded `salts` times so every (key, salt) pair still
    * matches. Use when one hot key would otherwise pin a single task and
    * the right side is small enough to replicate. */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)))).withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, Seq(keyCol, "__salt")).drop("__salt")
  }
}
