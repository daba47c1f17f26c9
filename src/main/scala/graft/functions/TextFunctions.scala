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
