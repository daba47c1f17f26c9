package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenization kernels for the dedup/text hot paths.
  *
  * The composable form — `array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', words[i], ...)))` over `filter(split(text,' '), ...)` —
  * pays four chained higher-order functions, each an interpreted lambda
  * per ELEMENT. These expressions do the whole job in one tight per-ROW
  * pass (documents are few-but-wide, so per-row CodegenFallback costs
  * nothing while the per-element lambda overhead dominated the profile:
  * shingling 5k docs took ~5 s of the 5.5 s d02 runtime).
  *
  * Output parity: identical strings/sets as the composable form
  * (whitespace split, empties dropped, n-grams space-joined, first-
  * occurrence-order distinct), so oracle-checked results are unchanged.
  */
object TextFunctions {
  private[functions] def splitWords(t: UTF8String): Array[String] = {
    // split on single space, drop empties — same as filter(split(text,' '))
    val s = t.toString
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length / 5 + 1)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) out += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }
}

/** word_ngrams(text, n): distinct space-joined word n-grams. */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("word_ngrams expects a string")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val words = TextFunctions.splitWords(input.asInstanceOf[UTF8String])
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): WordNGrams = copy(child = c)
  override def prettyName: String = "word_ngrams"
}

/** word_tokens(text): whitespace tokens with empties dropped. */
case class WordTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("word_tokens expects a string")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val words = TextFunctions.splitWords(input.asInstanceOf[UTF8String])
    new GenericArrayData(words.map(w => UTF8String.fromString(w): Any))
  }

  override protected def withNewChildInternal(c: Expression): WordTokens = copy(child = c)
  override def prettyName: String = "word_tokens"
}

/** winnow_fps(text, k, w): winnowing document fingerprints (the MOSS
  * scheme) over a TRUE rolling hash — Rabin-Karp base-256 polynomial mod
  * 1e9+7, each next k-gram hash derived from the previous in O(1), then
  * the minimum of every w-length window of gram hashes, deduplicated.
  *
  * Char-level (robust to word-boundary edits, complements the word-level
  * shingles of word_ngrams) and guarantees any shared substring of length
  * >= w + k - 1 yields at least one shared fingerprint. Integer
  * arithmetic is exactly reproducible in SQL (the oracle folds the same
  * (h * 256 + c) % p per gram — algebraically identical to the rolling
  * update). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "k, w >= 1")
  private val P = 1000000007L
  private val B = 256L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("winnow_fps expects a string")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    // B^(k-1) mod P, for removing the outgoing char
    var bk1 = 1L
    var t = 0
    while (t < k - 1) { bk1 = bk1 * B % P; t += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + s.charAt(i).toLong) % P; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = ((h - s.charAt(i - 1).toLong * bk1 % P + P) % P * B + s.charAt(i + k - 1).toLong) % P
      hs(i) = h
      i += 1
    }
    // sliding-window minima via monotonic deque, dedup'd
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < m) {
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(i)) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst() <= i - w) dq.pollFirst()
      if (i >= w - 1) seen.add(hs(dq.peekFirst()))
      i += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints = copy(child = c)
  override def prettyName: String = "winnow_fps"
}

/** simhash64(grams): 64-bit SimHash of an array of gram hashes (long) or
  * tokens (string) in ONE per-row pass — replaces the composed form's
  * explode + 64-column bit-sum aggregation + signature reassembly, which
  * shuffles Σgrams rows and runs 64 conditional sums per gram through
  * the aggregator. Element hashing is Spark's own xxhash64 (XXH64, seed
  * 42) so signatures are bit-identical to the composed form; bit j of
  * the result is set iff more elements have bit j set than clear
  * (ties → clear, matching `sum > 0`).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("simhash64 expects array<long> or array<string>")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private lazy val isString =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (isString) XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        else XXH64.hashLong(arr.getLong(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** char_class_counts(text): single-pass digit / symbol / uppercase
  * counts over code points — one scan of the string instead of the four
  * `length(regexp_replace(...))` passes the composable form costs (at
  * 100 TB, four regex engines per row IS the t19 scan bill).
  *
  * Class parity with the regexp forms `[0-9]`, `[^0-9A-Za-z ]`, `[A-Z]`
  * over code points (surrogate pairs count once, exactly like Spark's
  * `length` and the oracle's `LENGTH`), proven by a kernel property
  * test against the composed regexp expressions on real documents. */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("char_class_counts expects a string")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_digit", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_sym", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_upper", org.apache.spark.sql.types.LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var digit = 0L; var sym = 0L; var upper = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= '0' && cp <= '9') digit += 1
      else if (cp >= 'A' && cp <= 'Z') upper += 1
      if (!((cp >= '0' && cp <= '9') || (cp >= 'A' && cp <= 'Z') ||
            (cp >= 'a' && cp <= 'z') || cp == ' ')) sym += 1
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](digit, sym, upper))
  }

  override protected def withNewChildInternal(c: Expression): CharClassCounts = copy(child = c)
  override def prettyName: String = "char_class_counts"
}
