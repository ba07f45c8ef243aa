package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two array<double> columns as a native Catalyst
  * Expression. The higher-order `aggregate(zip_with(...))` formulation
  * is semantically identical but interpreted (one boxed lambda call per
  * element); this generates a primitive unboxed loop inside whole-stage
  * codegen — the difference between 35 s and a few seconds on the
  * pairwise-similarity workloads.
  *
  * Accumulation is a sequential left-to-right sum (i = 0..n), the same
  * IEEE order as DuckDB's `list_reduce`, so oracle results stay
  * bit-identical.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dotp"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  // Locals MUST come from freshName: two dotp calls landing in one
  // generated scope (e.g. a collapsed projection evaluating several
  // hyperplane dots, or a filter predicate inlining a dot twice)
  // otherwise redeclare `i`/`n`/`s` — Janino rejects the class and the
  // whole operator silently falls back to interpreter mode, which is
  // exactly the boxed-lambda cost this Expression exists to avoid.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val s = ctx.freshName("dotS")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "dotp")(exprs => DotProduct(exprs(0), exprs(1)))
}
