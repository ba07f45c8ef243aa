package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(tokens, merges)` — apply a rank-ordered BPE merge table to
  * a token sequence with ONE greedy left-to-right pass per rule, in
  * O(rules · tokens) with mutable buffers.
  *
  * Semantics are the exact fold [[graft.operators.TextAnalysis.bpeEncode]]
  * previously expressed with nested higher-order `aggregate`s (and which
  * the DuckDB oracle still states as a nested `list_reduce` — that SQL
  * remains the semantic definition): for each merge `"a b"` in rank
  * order, scan the sequence once; whenever the last emitted token equals
  * `a` and the incoming token equals `b`, replace the last emitted token
  * with the merged symbol `"a b"`. A merged symbol contains the joining
  * space while rule sides are space-free words, so a merge can never
  * re-match within any pass — one pass per rule is exact, and greedy
  * left-to-right matching ('aaa' under rule 'a a' → ['a a', 'a']) is the
  * tie-break both engines share.
  *
  * Why an Expression and not Column algebra: Spark arrays are immutable,
  * so the `aggregate`-based fold appended each token with
  * `concat(out, array(t))` — one full accumulator copy per element,
  * making a single merge pass O(tokens²) in element copies, ×rules, per
  * document (measured 13.3 s isolated at sf0.1, the suite's one real
  * hotspot). Here the pass compacts in place over a pre-sized buffer:
  * per document the cost is linear in document length, which is the
  * dimension that actually grows at 100 TB.
  */
object BpeApply {

  private val Space = UTF8String.fromString(" ")

  /** One in-place compaction pass per rule over a shared buffer.
    * Reads (`i`) always run at or ahead of writes (`o`), so the buffer
    * doubles as both input and output of each pass. Called from both
    * interpreted eval and generated code.
    *
    * Rule parsing matches the oracle's `string_split(m, ' ')[1]/[2]`
    * exactly: `a` is the first space-separated part, `b` the SECOND
    * part (NOT everything after the first space — a rule with extra
    * spaces matches on its first two parts and still substitutes the
    * whole rule string). Rules mined by `bpeEncode` always have
    * exactly one space, but `bpe_apply` is a registered SQL function,
    * so the general contract is pinned by spec. Null tokens and null
    * rules pass through unmatched (the oracle's NULL comparisons take
    * the ELSE branch), never NPE. */
  def applyMerges(toks: ArrayData, merges: ArrayData): ArrayData = {
    val n = toks.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) { buf(i) = toks.getUTF8String(i); i += 1 }
    var len = n
    var r = 0
    val nRules = merges.numElements()
    while (r < nRules) {
      val m = merges.getUTF8String(r)
      val sp = if (m == null) -1 else m.indexOf(Space, 0)
      if (sp >= 0) {
        val a = m.substring(0, sp)
        val sp2 = m.indexOf(Space, sp + 1)
        val b = m.substring(sp + 1, if (sp2 < 0) m.numChars() else sp2)
        var o = 0
        i = 0
        while (i < len) {
          val t = buf(i)
          if (o > 0 && t != null && buf(o - 1) != null &&
            buf(o - 1).equals(a) && t.equals(b)) buf(o - 1) = m
          else { buf(o) = t; o += 1 }
          i += 1
        }
        len = o
      }
      r += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Pair-form merge application: rules arrive as two parallel arrays
    * (`lefts(i)`, `rights(i)`) instead of `"a b"` strings, so a rule
    * side may itself CONTAIN spaces — which is exactly what iterative
    * BPE training produces from round 2 on (a learned symbol like
    * `"the cat"` becomes the left side of a later rule, and the
    * string form `"the cat sat"` cannot say where left ends). The
    * merged symbol is still `left + " " + right` (the same symbol
    * space as [[applyMerges]]); it is strictly longer than `left`, so
    * a merge can never re-match within its own pass and one greedy
    * left-to-right pass per rule stays exact. A null rule side never
    * matches; null tokens pass through. */
  def applyMergePairs(toks: ArrayData, lefts: ArrayData,
                      rights: ArrayData): ArrayData = {
    val n = toks.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) { buf(i) = toks.getUTF8String(i); i += 1 }
    var len = n
    var r = 0
    val nRules = math.min(lefts.numElements(), rights.numElements())
    while (r < nRules) {
      val a = lefts.getUTF8String(r)
      val b = rights.getUTF8String(r)
      if (a != null && b != null) {
        val m = UTF8String.concat(a, Space, b)
        var o = 0
        i = 0
        while (i < len) {
          val t = buf(i)
          if (o > 0 && t != null && buf(o - 1) != null &&
            buf(o - 1).equals(a) && t.equals(b)) buf(o - 1) = m
          else { buf(o) = t; o += 1 }
          i += 1
        }
        len = o
      }
      r += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Register as SQL functions for ad-hoc sessions that don't load
    * [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "bpe_apply")(
      exprs => BpeApplyExpr(exprs(0), exprs(1)))
    Registry.registerOnce(spark, "bpe_apply_pairs")(
      exprs => BpeApplyPairsExpr(exprs(0), exprs(1), exprs(2)))
  }
}

/** `bpe_apply(tokens: array<string>, merges: array<string>)` as a native
  * binary Expression — the whole merge application is one codegen'd call,
  * no UDF boxing, no per-element array copies. */
case class BpeApplyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // containsNull follows the INPUT token array: merge application never
  // introduces nulls, but it passes existing null elements through.
  override def dataType: DataType = left.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = false)
  }
  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(toks: Any, merges: Any): Any =
    BpeApply.applyMerges(toks.asInstanceOf[ArrayData], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, m) => s"graft.functions.BpeApply.applyMerges($t, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeApplyExpr =
    copy(left = newLeft, right = newRight)
}

/** `bpe_apply_pairs(tokens: array<string>, lefts: array<string>,
  * rights: array<string>)` — the pair-form twin of [[BpeApplyExpr]] for
  * rules whose sides may contain spaces (learned symbols from earlier
  * training rounds). Same one-codegen'd-call shape. */
case class BpeApplyPairsExpr(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {
  override def dataType: DataType = first.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = false)
  }
  override def prettyName: String = "bpe_apply_pairs"

  override protected def nullSafeEval(toks: Any, lefts: Any,
                                      rights: Any): Any =
    BpeApply.applyMergePairs(toks.asInstanceOf[ArrayData],
      lefts.asInstanceOf[ArrayData], rights.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, l, r) => s"graft.functions.BpeApply.applyMergePairs($t, $l, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeApplyPairsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
