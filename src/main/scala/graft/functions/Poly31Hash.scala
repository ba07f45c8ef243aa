package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting (SURVEY.md north-star text ops): a rolling
  * polynomial hash h = Σ c_i·31^i mod (2^31−1) over the string's UTF-16
  * code units, as a native Catalyst `Expression` with whole-stage
  * codegen — no UDF boxing, stays inside the generated loop.
  *
  * Portable: for BMP text (all testdata is ASCII) the same value is
  * `list_reduce(list_prepend(0, list_transform(range(1, len(t)+1),
  * i -> unicode(substr(t, i, 1)))), (a,b) -> (a*31+b) % 2147483647)`
  * in DuckDB — the oracle uses exactly that.
  */
case class Poly31Hash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly31"

  override protected def nullSafeEval(input: Any): Any =
    Poly31Hash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Poly31Hash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Poly31Hash =
    copy(child = newChild)
}

object Poly31Hash {
  final val P: Long = 2147483647L

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31L + s.charAt(i)) % P; i += 1 }
    h
  }

  /** Register as a SQL function so queries can call `poly31(col)`. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "poly31")(exprs => Poly31Hash(exprs.head))
}
