package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as a single native expression.
  *
  * The Column-algebra equivalent —
  * `array_distinct(transform(sequence(...), i -> concat_ws(slice(...))))`
  * — evaluates three interpreted lambdas per element; this does one
  * primitive pass per row. Semantics are identical (and mirrored by the
  * oracle SQL in Dedup.wordShinglesSql): documents shorter than n words
  * contribute their whole text as one shingle; first-occurrence
  * distinct.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val last = math.max(words.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, words.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Registers `shingles3(text)` (the n=3 form the dedup pipeline uses). */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "shingles3")(exprs => WordShingles(exprs.head, 3))
}
