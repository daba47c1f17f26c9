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
  *
  * OPERATING RANGE: the hash lives mod p = 2³¹−1, so as the true
  * distinct count approaches p the k-th minimum saturates against hash
  * collisions and the estimator tops out near p (~2.1·10⁹) — keep
  * per-group distinct counts ≲ 10⁸ (per-day DAU, per-shard id audits;
  * error from collisions there is < 5%). Corpus-wide distinct at 100 TB
  * needs a wider hash domain (e.g. xxhash64 into 2⁶⁴), which this
  * aggregate deliberately does NOT use: a 64-bit-domain KMV is not
  * expressible in overflow-free ANSI SQL, so it would cost the
  * bit-exact DuckDB oracle parity (e103) that makes this sketch
  * auditable. See SCALE.md §sketches.
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

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct requires an integral column " +
            s"(TINYINT/SMALLINT/INT/BIGINT), got ${other.catalogString}")
    }

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
      // checkInputDataTypes limits the child to integral types; widen here
      val u = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short   => s.longValue()
        case b: java.lang.Byte    => b.longValue()
      }
      // floorMod, not %: a negative id must land in [0, P) — a negative
      // hash would silently corrupt the (k-1)·p/h_k estimator. Matches
      // ANSI SQL `%` exactly on the non-negative ids the oracle uses.
      offer(buf, (A * java.lang.Math.floorMod(u, P) + B) % P)
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

/** KMV over the FULL 64-bit xxhash64 domain — the corpus-scale variant
  * [[KmvDistinct]]'s scaladoc points to: no saturation until distinct
  * counts approach 2⁶⁴, so it is the right tool for corpus-wide distinct
  * counting at 100 TB (distinct shingles, distinct URLs) where the
  * 2³¹−1 arithmetic hash tops out. The trade, documented in SCALE.md:
  * xxhash64 is not expressible in overflow-free ANSI SQL, so this
  * aggregate is ROWS-ONLY — its audits (d61) bound the error against an
  * exact count in a ScalaTest spec instead of a DuckDB hash.
  *
  * Mechanics: hashes map to [0, 2⁶³) (sign bit cleared — the estimator
  * needs an ordered domain), the buffer keeps the k minima (lattice-join
  * merge, order/partitioning-independent), estimate = (k−1)·2⁶³ / h_k.
  * Accepts integral AND string children (shingles hash via
  * XXH64.hashUTF8String — zero copies off the UnsafeRow). */
case class KmvDistinct64(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv_distinct64 needs k >= 2")

  private val Seed = 42L
  private val Dom = 9223372036854775807L // 2^63 - 1 (top of the cleared-sign domain)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct64 requires an integral or STRING column, " +
            s"got ${other.catalogString}")
    }

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
      val h = v match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, Seed)
        case l: java.lang.Long    =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(l.longValue(), Seed)
        case i: java.lang.Integer =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.longValue(), Seed)
        case s: java.lang.Short   =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(s.longValue(), Seed)
        case b: java.lang.Byte    =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(b.longValue(), Seed)
      }
      offer(buf, h & Dom) // clear the sign bit: ordered domain [0, 2^63)
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
      else (k - 1).toDouble * Dom.toDouble / kth.toDouble
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct64 =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct64"
}

/** Deterministic distributed bottom-k sampling — `bottomk_sample(priority,
  * value, k)` keeps the k (priority, value) pairs with the LEXICOGRAPHICALLY
  * smallest priority (ties broken by value) and returns the values in that
  * order. With priority = md5(content) this is priority sampling: the same
  * k exemplars come back on every run, at any parallelism, after any
  * re-ingest — the reproducible "show me 5 docs from this shard" primitive
  * a 100 TB curation pipeline needs where rand()-sampling would churn.
  *
  * Like the KMV sketches, the merge is a lattice join (union, keep k
  * smallest), so the aggregate is order- and partitioning-independent and
  * partial-aggregates map-side: a billion-row group ships k strings.
  * Fully ANSI-expressible (md5 + ROW_NUMBER), so the DuckDB oracle checks
  * it hash-exact (p48).
  *
  * Priorities must not contain U+0001 (the internal separator, chosen
  * below every hex/ASCII char so concatenated ordering equals tuple
  * ordering — md5 hex in every shipped caller); both children are strings
  * (cast ids/structs to string at the call site). */
case class BottomKSample(
    priority: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 1, "bottomk_sample needs k >= 1")
  private val Sep: Char = '\u0001'

  override def children: Seq[Expression] = Seq(priority, value)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (priority.dataType, value.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (p, v) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottomk_sample requires (STRING priority, STRING value), got " +
            s"(${p.catalogString}, ${v.catalogString})")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def offer(buf: java.util.TreeSet[String], s: String): Unit =
    if (buf.size < k) { buf.add(s); () }
    else if (s.compareTo(buf.last) < 0) {
      if (buf.add(s)) { buf.remove(buf.last); () }
    }

  override def update(buf: java.util.TreeSet[String],
                      input: InternalRow): java.util.TreeSet[String] = {
    val p = priority.eval(input)
    val v = value.eval(input)
    if (p != null && v != null) offer(buf, s"${p.toString}$Sep${v.toString}")
    buf
  }

  override def merge(buf: java.util.TreeSet[String],
                     other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val s = it.next()
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromString(s.substring(s.indexOf(Sep.toInt) + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val entries = new Array[Array[Byte]](buf.size)
    var total = 4
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val b = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries(i) = b; total += 4 + b.length; i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(entries.length)
    entries.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[String]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(priority = newChildren(0), value = newChildren(1))
  override def prettyName: String = "bottomk_sample"
}
