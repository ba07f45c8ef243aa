package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Two-dimensional Z-order (Morton) key as a native codegen Expression:
  * interleaves the low 16 bits of two non-negative integer columns
  * (x bit i → z bit 2i+1, y bit i → z bit 2i), producing a 32-bit key
  * whose sort order clusters BOTH dimensions at once — the layout trick
  * behind multi-column data skipping: sort/range-partition a table by
  * `zorder2(a, b)` before writing and every file's min/max footer
  * bounds a AND b, so scans filtering on either column prune files
  * (a single-column sort only ever bounds that one column).
  *
  * Engine-portable: z = Σ_i ((x÷2^i) mod 2)·2^(2i+1) + ((y÷2^i) mod 2)·2^(2i)
  * — pure integer arithmetic, replayed verbatim in the DuckDB oracle
  * ([[ZOrder2.sql]]). The implementation uses the standard mask-spread
  * bit twiddle (5 ops per dimension instead of 16 loop iterations).
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder2.morton((long)$a, (long)$b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 16 bits of v to the even bit positions 0,2,…,30. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** z(x, y) with x on odd and y on even bit positions. */
  def morton(x: Long, y: Long): Long = (spread(x) << 1) | spread(y)

  /** The DuckDB spelling: the bit-sum definition expanded to 16 integer
    * div/mod terms per dimension (no dialect-specific bit operators).
    * Inputs must be non-negative; only the low 16 bits contribute,
    * exactly as [[morton]] masks. */
  def sql(x: String, y: String): String =
    (0 until 16).map { i =>
      val p = 1L << i
      s"((($x) // $p) % 2) * ${1L << (2 * i + 1)} + ((($y) // $p) % 2) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "zorder2")(exprs => ZOrder2(exprs(0), exprs(1)))
}
