package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the custom Catalyst kernels (interpreted eval
  * path — no SparkSession needed, hundreds of cases per property). The
  * codegen path is covered by VectorFunctionsSpec's codegen-vs-interpreted
  * agreement test and the oracle gate. */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val finiteFloat = Gen.chooseNum(-100.0f, 100.0f)
  private val vecGen = Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, finiteFloat).map(_.toArray))
  private def flit(a: Array[Float]) =
    Literal.create(ArrayData.toArrayData(a), ArrayType(FloatType))
  private def llit(a: Array[Long]) =
    Literal.create(ArrayData.toArrayData(a), ArrayType(LongType))

  test("vec_dot == sequential widened fold over the shorter prefix") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val expect = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      DotProduct(flit(a), flit(b)).eval(null).asInstanceOf[Double] == expect
    })
  }

  test("vec_norm == sqrt of the sequential squared fold") {
    check(Prop.forAll(vecGen) { a =>
      val expect = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      VecNorm(flit(a)).eval(null).asInstanceOf[Double] == expect
    })
  }

  private val bitsGen = Gen.chooseNum(1, 128)
  private val seedGen = Gen.chooseNum(-1000, 1000)

  test("vec_sign_bits: packed width, no stray bits, power-of-2 scale invariance") {
    check(Prop.forAll(vecGen, seedGen, bitsGen) { (a, seed, nBits) =>
      def sig(v: Array[Float]): Array[Long] =
        VecSignBits(flit(v), seed, nBits).eval(null)
          .asInstanceOf[ArrayData].toLongArray()
      val s = sig(a)
      val widthOk = s.length == (nBits + 63) / 64
      // bits at positions >= nBits are never set
      val spare = nBits % 64
      val strayOk = spare == 0 || (s.last & ~((1L << spare) - 1)) == 0L
      // scaling by a power of two commutes with IEEE rounding -> same signs
      val scaleOk = sig(a.map(_ * 4.0f)).sameElements(s)
      widthOk && strayOk && scaleOk
    })
  }

  test("vec_sign_bits: negated vector sets a disjoint bit set") {
    check(Prop.forAll(vecGen, seedGen, bitsGen) { (a, seed, nBits) =>
      val s = VecSignBits(flit(a), seed, nBits).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      val n = VecSignBits(flit(a.map(-_)), seed, nBits).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      s.zip(n).forall { case (x, y) => (x & y) == 0L }
    })
  }

  test("vec_lsh_keys: l keys of b bits, reading only the first nBits of the signature") {
    val cfg = for {
      nBits <- Gen.chooseNum(2, 120)
      b <- Gen.chooseNum(1, math.min(nBits, 16))
      l <- Gen.chooseNum(1, 32)
      seed <- seedGen
      words <- Gen.listOfN((nBits + 63) / 64, Gen.long).map(_.toArray)
      garbage <- Gen.long
    } yield (nBits, b, l, seed, words, garbage)
    check(Prop.forAll(cfg) { case (nBits, b, l, seed, words, garbage) =>
      def keys(sig: Array[Long]): Array[Long] =
        VecLshKeys(llit(sig), seed, nBits, b, l).eval(null)
          .asInstanceOf[ArrayData].toLongArray()
      val k = keys(words)
      val shapeOk = k.length == l && k.forall(x => x >= 0 && x < (1L << b))
      // flipping bits at positions >= nBits never changes any key
      val spare = nBits % 64
      val noisy = words.clone()
      if (spare != 0)
        noisy(noisy.length - 1) = (noisy.last & ((1L << spare) - 1)) | (garbage & ~((1L << spare) - 1))
      val maskOk = keys(noisy).sameElements(k)
      shapeOk && maskOk
    })
  }

  private val textGen =
    Gen.listOf(Gen.oneOf("a", "b", "ab", "ba", " ", "  ")).map(_.mkString)

  test("winnow_fps == naive per-gram fold + window-min + distinct reference") {
    val P = 1000000007L
    val cfg = for {
      k <- Gen.chooseNum(1, 6)
      w <- Gen.chooseNum(1, 5)
      t <- Gen.listOf(Gen.oneOf("a", "b", "c", "xy", " ")).map(_.mkString)
    } yield (k, w, t)
    check(Prop.forAll(cfg) { case (k, w, t) =>
      val out = WinnowFingerprints(Literal.create(UTF8String.fromString(t)), k, w)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val expect =
        if (t.length < k + w - 1) Seq.empty
        else {
          val hs = (0 to t.length - k).map(i =>
            t.substring(i, i + k).foldLeft(0L)((h, c) => (h * 256 + c.toLong) % P))
          hs.sliding(w).map(_.min).toSeq.distinct
        }
      out == expect
    })
  }

  test("word_tokens == split-filter reference") {
    check(Prop.forAll(textGen) { t =>
      val out = WordTokens(Literal.create(UTF8String.fromString(t)))
        .eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      got == t.split(" ").filter(_.nonEmpty).toSeq
    })
  }

  test("word_ngrams == sliding-distinct reference (first-occurrence order)") {
    val nGen = Gen.chooseNum(1, 4)
    check(Prop.forAll(textGen, nGen) { (t, n) =>
      val out = WordNGrams(Literal.create(UTF8String.fromString(t)), n)
        .eval(null).asInstanceOf[ArrayData]
      val got = (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      val words = t.split(" ").filter(_.nonEmpty).toSeq
      val expect =
        if (words.length < n) Seq.empty
        else words.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == expect
    })
  }

  test("simhash64 == composed bit-sum reference over xxhash64 elements") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def reference(hs: Seq[Long]): Long = {
      val counts = new Array[Int](64)
      hs.foreach { h =>
        (0 until 64).foreach { j =>
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((s, j) => if (counts(j) > 0) s | (1L << j) else s)
    }
    val longsGen = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    check(Prop.forAll(longsGen) { hs =>
      val got = SimHash64(llit(hs.toArray)).eval(null).asInstanceOf[Long]
      got == reference(hs.map(XXH64.hashLong(_, 42L)))
    })
    // string path: element hash must equal Spark's xxhash64(string)
    val wordsGen = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.map(_.take(12))))
    check(Prop.forAll(wordsGen) { ws =>
      val arr = ArrayData.toArrayData(ws.map(UTF8String.fromString).toArray)
      val got = SimHash64(Literal.create(arr,
        ArrayType(org.apache.spark.sql.types.StringType))).eval(null).asInstanceOf[Long]
      got == reference(ws.map(w => XXH64.hashUTF8String(UTF8String.fromString(w), 42L)))
    })
  }

  test("sq8_encode: bounded codes, max-magnitude dim saturates, zero vec -> zero codes") {
    check(Prop.forAll(vecGen) { a =>
      val code = Sq8Encode(flit(a)).eval(null).asInstanceOf[Array[Byte]]
      val maxAbs = if (a.isEmpty) 0.0 else a.map(x => math.abs(x.toDouble)).max
      code.length == a.length &&
        code.forall(b => b >= -127 && b <= 127) &&
        (maxAbs == 0.0 ||
          a.indices.filter(i => math.abs(a(i).toDouble) == maxAbs)
            .exists(i => math.abs(code(i).toInt) == 127)) &&
        (maxAbs > 0.0 || code.forall(_ == 0))
    })
  }

  test("sq8_cos approximates true cosine within quantization error") {
    val denseGen = Gen.chooseNum(8, 64).flatMap(n => Gen.listOfN(n, finiteFloat).map(_.toArray))
    check(Prop.forAll(denseGen, denseGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val (ax, bx) = (a.take(n), b.take(n))
      val ca = Sq8Encode(flit(ax)).eval(null).asInstanceOf[Array[Byte]]
      val cb = Sq8Encode(flit(bx)).eval(null).asInstanceOf[Array[Byte]]
      val q = Sq8Cos(Literal.create(ca, org.apache.spark.sql.types.BinaryType),
                     Literal.create(cb, org.apache.spark.sql.types.BinaryType))
        .eval(null).asInstanceOf[Double]
      val dot = ax.zip(bx).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(ax.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(bx.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0.0 || nb == 0.0) q == 0.0
      else {
        // int8 quantization error bound: each element off by <= 1/254 of the
        // per-vector max; cosine error stays well under ~3 * sqrt(dim)/127
        val err = 3.0 * math.sqrt(n.toDouble) / 127.0
        math.abs(q - dot / (na * nb)) <= err
      }
    })
  }
}
