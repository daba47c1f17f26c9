package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator example of the custom-plan extension path (logical node
  * + planner Strategy + physical exec, registered via GraftExtensions):
  * brute-force cosine top-k as ONE operator.
  *
  * The composed form (broadcast join -> N^2 rows -> window top-k) must
  * materialize every candidate pair into the window machinery even with
  * WindowGroupLimit pruning. This exec keeps a k-slot bounded buffer per
  * query row and emits exactly N x k rows — no pair stream, no sort, no
  * extra shuffle (the per-query result is built where the query row
  * lives).
  *
  * Result parity with s01's composed form and the DuckDB oracle:
  * identical dot/norm arithmetic (widen float->double, sequential
  * accumulate), cosine rounded like Spark's round(x, 6) =
  * BigDecimal.valueOf(x).setScale(6, HALF_UP), ties on the ROUNDED value
  * broken by ascending neighbor id — the same total order the window
  * version sorts by.
  */
case class CosineTopKNode(left: LogicalPlan, right: LogicalPlan, k: Int,
                          override val output: Seq[Attribute])
    extends BinaryNode {
  // left: (q_id, va: array<float>, na: double); right: (n_id, vb, nb).
  // Output attrs are constructor-carried so exprIds stay stable across
  // tree copies; consuming every child column keeps ColumnPruning from
  // projecting the inputs away under this node.
  override def references: AttributeSet = AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): CosineTopKNode =
    copy(left = l, right = r)
}

object CosineTopKNode {
  def create(left: LogicalPlan, right: LogicalPlan, k: Int): CosineTopKNode =
    CosineTopKNode(left, right, k, Seq(
      left.output.head,
      AttributeReference("n_id", LongType, nullable = false)(),
      AttributeReference("rnk", LongType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)()))
}

case class CosineTopKExec(left: SparkPlan, right: SparkPlan, k: Int,
                          override val output: Seq[Attribute])
    extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  private def round6(x: Double): Double =
    // pass non-finite through (BigDecimal.valueOf throws on NaN/Inf);
    // matches Spark's round(): a zero-norm or NaN embedding yields a NaN
    // cosine for that pair instead of crashing the query
    if (!java.lang.Double.isFinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val outTypes = output.map(_.dataType)
    left.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(outTypes.toArray)
      val nbrIds = new scala.collection.mutable.ArrayBuffer[Long]()
      val nbrVecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
      val nbrNorms = new scala.collection.mutable.ArrayBuffer[Double]()
      broadcastRows.value.foreach { r =>
        nbrIds += r.getLong(0)
        nbrVecs += r.getArray(1).toFloatArray()
        nbrNorms += r.getDouble(2)
      }
      val n = nbrIds.length
      iter.flatMap { row =>
        val qId = row.getLong(0)
        val va = row.getArray(1).toFloatArray()
        val na = row.getDouble(2)
        // bounded top-k buffer ordered by (cos desc, n_id asc)
        val topIds = new Array[Long](kk)
        val topCos = new Array[Double](kk)
        var size = 0
        var i = 0
        while (i < n) {
          if (nbrIds(i) != qId) {
            val vb = nbrVecs(i)
            val dims = math.min(va.length, vb.length)
            var acc = 0.0
            var d = 0
            while (d < dims) { acc += va(d).toDouble * vb(d).toDouble; d += 1 }
            val cos = round6(acc / (na * nbrNorms(i)))
            val id = nbrIds(i)
            // insert if it beats the current tail
            if (size < kk || cos > topCos(size - 1) ||
                (cos == topCos(size - 1) && id < topIds(size - 1))) {
              var pos = if (size < kk) size else kk - 1
              while (pos > 0 && (cos > topCos(pos - 1) ||
                     (cos == topCos(pos - 1) && id < topIds(pos - 1)))) {
                topCos(pos) = topCos(pos - 1); topIds(pos) = topIds(pos - 1)
                pos -= 1
              }
              topCos(pos) = cos; topIds(pos) = id
              if (size < kk) size += 1
            }
          }
          i += 1
        }
        (0 until size).iterator.map { r =>
          proj(InternalRow(qId, topIds(r), (r + 1).toLong, topCos(r)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): CosineTopKExec =
    copy(left = l, right = r)
}

object CosineTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case node @ CosineTopKNode(l, r, k, _) =>
      CosineTopKExec(planLater(l), planLater(r), k, node.output) :: Nil
    case _ => Nil
  }
}

object CosineTopK {
  /** queries: (q_id, va, na); neighbors: (n_id, vb, nb) — both in that
    * column order. Returns (q_id, n_id, rnk, cos) top-k per query. */
  def apply(spark: SparkSession, queries: DataFrame, neighbors: DataFrame, k: Int): DataFrame = {
    val node = CosineTopKNode.create(
      org.apache.spark.sql.GraftPlanFactory.analyzed(queries),
      org.apache.spark.sql.GraftPlanFactory.analyzed(neighbors),
      k)
    org.apache.spark.sql.GraftPlanFactory.ofRows(spark, node)
  }
}
