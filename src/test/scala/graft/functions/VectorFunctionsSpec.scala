package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot/vec_norm match the interpreted HOF computation bit-for-bit") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)))
      .toDF("a", "b")
    val out = df.select(
      expr("vec_dot(a, b)").as("dot"),
      expr("vec_norm(a)").as("na"),
      expr("aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)), transform(b, x -> CAST(x AS DOUBLE)), (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("dot_hof"),
      sqrt(expr("aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)")).as("na_hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("dot")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("dot_hof")))
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("na")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("na_hof")))
    }
  }

  test("interpreted eval path (no codegen) agrees with codegen path") {
    VectorFunctions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal.create(ArrayData.toArrayData(Array(1.5f, -2.5f)), ArrayType(FloatType))
    val b = Literal.create(ArrayData.toArrayData(Array(2.0f, 4.0f)), ArrayType(FloatType))
    val dot = DotProduct(a, b).eval(null).asInstanceOf[Double]
    assert(dot == 1.5 * 2.0 + -2.5 * 4.0)
    val nrm = VecNorm(a).eval(null).asInstanceOf[Double]
    assert(nrm == math.sqrt(1.5 * 1.5 + 2.5 * 2.5))
  }

  test("mismatched lengths fold over the shorter prefix") {
    VectorFunctions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(10.0f))).toDF("a", "b")
    assert(df.select(expr("vec_dot(a, b)")).head().getDouble(0) == 10.0)
  }

  test("sq8_cos rejects codes of different dimensionality") {
    // silently truncating would turn a pipeline dimension bug into
    // plausible-looking garbage cosines
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val a = Literal.create(Array[Byte](10, 20, 30), BinaryType)
    val b = Literal.create(Array[Byte](10, 20), BinaryType)
    intercept[IllegalArgumentException] { Sq8Cos(a, b).eval(null) }
  }

  test("char_class_counts kernel == composed regexp form on real docs + edge strings") {
    VectorFunctions.register(spark)
    def classCount(cls: String) =
      (length(col("text")) - length(regexp_replace(col("text"), cls, ""))).cast("long")
    val docs = graft.engine.Tables.documents(spark, sf).select("text")
      .unionByName(Seq("", "A1 b!", "ÄÖü €3", "  ", "ALL CAPS 99??").toDF("text"))
    val rows = docs
      .select(expr("char_class_counts(text)").as("cc"),
        classCount("[0-9]").as("d"), classCount("[^0-9A-Za-z ]").as("s"),
        classCount("[A-Z]").as("u"))
      .collect()
    rows.foreach { r =>
      val cc = r.getStruct(0)
      assert(cc.getLong(0) == r.getLong(1), s"digit mismatch: $r")
      assert(cc.getLong(1) == r.getLong(2), s"sym mismatch: $r")
      assert(cc.getLong(2) == r.getLong(3), s"upper mismatch: $r")
    }
  }

  test("simhash64 kernel == composed explode + bit-sum form on real docs") {
    VectorFunctions.register(spark)
    val docs = graft.engine.Tables.documents(spark, sf).limit(50)
    val kernel = docs
      .select(col("doc_id"), expr("simhash64(word_tokens(text))").as("sig"))
    // the pre-kernel form: per-token xxhash64, 64 conditional bit sums,
    // signature reassembly — the element hash here is Spark's OWN
    // xxhash64, so equality proves the kernel's XXH64 calls match it
    val toks = docs.select(col("doc_id"), explode(expr("word_tokens(text)")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val composed = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
    val k = kernel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k.nonEmpty && k == c)
  }
}
