package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a full
  * TypedImperativeAggregate — the third custom-expression surface in the
  * library next to the codegen'd scalar kernels (VectorFunctions) and the
  * whole-operator plan (CosineTopK).
  *
  * Why KMV and not another HLL: the merge is "union the sets, keep the k
  * smallest" — a LATTICE JOIN, so the aggregate is ORDER- AND
  * PARTITIONING-INDEPENDENT (any merge tree yields the same buffer), and
  * with an arithmetic Carter–Wegman hash h(u) = (a·(u mod p) + b) mod p
  * (p = 2³¹−1; products < 2⁵³, overflow-free under ANSI) the whole sketch
  * is EXPRESSIBLE IN ANSI SQL — the DuckDB oracle reproduces the estimate
  * bit-for-bit, which no seeded-xxhash sketch (HLL++, CMS) allows. The
  * estimator is the classic (k−1)·p / h_(k), with the ≤ k case exact by
  * construction.
  *
  * State is k longs regardless of cardinality; partial aggregation is
  * map-side (ObjectHashAggregate), so a 10⁹-key group shuffles k values.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_distinct needs k >= 2")

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  // Fibonacci-hashing multiplier (≈ 2³¹/φ): a SMALL multiplier never wraps
  // mod p on small structured ids (sequential user ids land linearly in
  // [0, a·max_id] and the k-th minimum collapses → massive overestimate);
  // the golden-ratio multiplier gives a Weyl-equidistributed sequence for
  // sequential ids (three-gap theorem) and behaves like a uniform hash on
  // arbitrary ids. a·(u mod p) < 2⁶² — overflow-free under ANSI.
  private val A = 1327217885L
  private val B = 12345L

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.remove(buf.last); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[Long]
      offer(buf, (A * (u % P) + B) % P)
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size.toLong
    val kth = if (buf.isEmpty) 0L else buf.last.longValue()
    val est =
      if (n < k) n.toDouble
      else (k - 1).toDouble * P.toDouble / kth.toDouble
    InternalRow(n, kth, est)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct"
}
