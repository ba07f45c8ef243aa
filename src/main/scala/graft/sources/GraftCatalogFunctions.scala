package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The graft function library exposed through the DSV2
  * [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]: the same
  * semantics as the session-wide Catalyst Expressions
  * (`GraftExtensions`), but resolvable per-catalog by any SQL client —
  * `SELECT graft.dotp(a, b)`. Every bound function implements BOTH
  * `produceResult` (interpreted fallback) and the MAGIC `invoke` method
  * with primitive/unsafe signatures, which Spark compiles to a direct
  * method call inside whole-stage codegen (no InternalRow boxing per
  * call).
  *
  * Numeric contracts are shared with the Expressions they mirror:
  * `dotp` folds sequentially left-to-right from 0.0 (the IEEE order the
  * DuckDB `list_reduce` oracles replay — [[graft.functions.DotProduct]]),
  * `poly31` delegates to the single [[graft.functions.Poly31Hash.hash]]
  * implementation, and `hamming64` is xor+popcount, the sketch-ANN
  * family's distance.
  */
object GraftCatalogFunctions {
  val Names: Array[String] = Array("dotp", "poly31", "hamming64", "bucket",
    "truncate")

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "dotp" => Some(new DotpUnbound)
      case "poly31" => Some(new Poly31Unbound)
      case "hamming64" => Some(new HammingUnbound)
      case "bucket" => Some(new BucketUnbound)
      case "truncate" => Some(new TruncateUnbound(None))
      // width-suffixed resolution names for the truncate LAYOUT
      // transform (`truncate7(m)` — see CsvTruncSpec.transform for why
      // the width must ride the name): internal, not listed
      case n if n.startsWith("truncate") &&
          n.substring(8).nonEmpty && n.substring(8).forall(_.isDigit) =>
        Some(new TruncateUnbound(Some(n.substring(8).toInt)))
      case _ => None
    }
}

private[sources] class DotpUnbound extends UnboundFunction {
  override def name(): String = "dotp"
  override def description(): String =
    "dotp(array<double>, array<double>) -> double: sequential-fold dot product"
  override def bind(inputType: StructType): BoundFunction = {
    // accept any numeric-element arrays — the declared inputTypes
    // (array<double>) make Spark insert the element casts
    val ok = inputType.length == 2 && inputType.fields.forall(_.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    })
    if (!ok) throw new UnsupportedOperationException(
      s"dotp expects (array<double>, array<double>); got ${inputType.simpleString}")
    new DotpBound
  }
}

private[sources] class DotpBound extends ScalarFunction[java.lang.Double] {
  override def name(): String = "dotp"
  override def canonicalName(): String = "graft.dotp"
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(DoubleType), ArrayType(DoubleType))
  override def resultType(): DataType = DoubleType

  /** MAGIC method — compiled to a direct call inside codegen. */
  def invoke(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override def produceResult(input: InternalRow): java.lang.Double = {
    if (input.isNullAt(0) || input.isNullAt(1)) return null
    invoke(input.getArray(0), input.getArray(1))
  }
}

private[sources] class Poly31Unbound extends UnboundFunction {
  override def name(): String = "poly31"
  override def description(): String =
    "poly31(string) -> bigint: the graft polynomial rolling hash"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.length != 1 || inputType.fields(0).dataType != StringType)
      throw new UnsupportedOperationException(
        s"poly31 expects (string); got ${inputType.simpleString}")
    new Poly31Bound
  }
}

private[sources] class Poly31Bound extends ScalarFunction[java.lang.Long] {
  override def name(): String = "poly31"
  override def canonicalName(): String = "graft.poly31"
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType

  def invoke(s: UTF8String): Long = graft.functions.Poly31Hash.hash(s.toString)

  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) null else invoke(input.getUTF8String(0))
}

/** The layout hash behind `PARTITIONED BY (bucket(n, col))` — exposed
  * as a catalog V2 function because Spark RESOLVES the bucket transform
  * through it: the write's clustered distribution shuffles by this
  * function, and storage-partitioned joins compare both sides'
  * transforms by its canonical name. One implementation
  * ([[CsvBuckets.id]]) serves the writer's file routing, the scan's
  * bucket pruning, and this SQL-visible face — they can never drift. */
private[sources] class BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key) -> int: the graft bucket-partitioning hash (splitmix64 " +
      "integral / FNV-1a 64 utf8), id = floorMod(hash, n)"
  override def bind(inputType: StructType): BoundFunction = {
    val ok = inputType.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      PartitionedCsvLayout.keyTypeOk(inputType.fields(1).dataType)
    if (!ok) throw new UnsupportedOperationException(
      "bucket expects (int, string|integral|boolean); got " +
        inputType.simpleString)
    new BucketBound(inputType.fields(1).dataType)
  }
}

private[sources] class BucketBound(keyType: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    val v: Any = keyType match {
      case StringType => input.getUTF8String(1)
      case LongType => input.getLong(1)
      case IntegerType => input.getInt(1)
      case ShortType => input.getShort(1)
      case BooleanType => input.getBoolean(1)
      case other => throw new UnsupportedOperationException(
        s"bucket: unsupported key type $other")
    }
    CsvBuckets.id(n, v)
  }
}

/** The order-preserving layout transform behind `PARTITIONED BY
  * (truncate(w, col))` — exposed as a catalog V2 function for the same
  * reason as `bucket`: Spark resolves the transform through it for
  * write distributions and storage-partitioned-join compatibility.
  * Strings truncate to their first `w` chars; integrals to their
  * `w`-wide bin's lower bound ([[CsvTruncSpec]]). */
private[sources] class TruncateUnbound(fixedWidth: Option[Int])
    extends UnboundFunction {
  override def name(): String = fixedWidth.fold("truncate")(w => s"truncate$w")
  override def description(): String =
    "truncate(w, key) -> key-type: order-preserving truncation (string " +
      "prefix / integral width-bin lower bound) — the layout transform"
  override def bind(inputType: StructType): BoundFunction = {
    def keyOk(dt: DataType) = dt match {
      case StringType | LongType | IntegerType | ShortType => true
      case _ => false
    }
    fixedWidth match {
      case Some(w) => // the single-leaf layout form: truncate<w>(key)
        if (inputType.length != 1 || !keyOk(inputType.fields(0).dataType))
          throw new UnsupportedOperationException(
            s"${name()} expects (string|integral); got ${inputType.simpleString}")
        new TruncateBound(inputType.fields(0).dataType, Some(w))
      case None =>
        val ok = inputType.length == 2 &&
          inputType.fields(0).dataType == IntegerType &&
          keyOk(inputType.fields(1).dataType)
        if (!ok) throw new UnsupportedOperationException(
          "truncate expects (int, string|integral); got " + inputType.simpleString)
        new TruncateBound(inputType.fields(1).dataType, None)
    }
  }
}

private[sources] class TruncateBound(keyType: DataType, fixedWidth: Option[Int])
    extends ScalarFunction[Any] {
  override def name(): String = fixedWidth.fold("truncate")(w => s"truncate$w")
  /** The width rides the canonical name, so storage-partitioned joins
    * only match layouts truncated to the SAME width. */
  override def canonicalName(): String =
    fixedWidth.fold("graft.truncate")(w => s"graft.truncate[$w]")
  override def inputTypes(): Array[DataType] =
    fixedWidth.fold(Array(IntegerType, keyType))(_ => Array(keyType))
  override def resultType(): DataType = keyType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Any = {
    val w = fixedWidth.getOrElse(input.getInt(0))
    val at = if (fixedWidth.isDefined) 0 else 1
    keyType match {
      case StringType =>
        val s = input.getUTF8String(at)
        if (s.numChars() <= w) s else s.substring(0, w)
      case LongType =>
        val v = input.getLong(at); v - java.lang.Math.floorMod(v, w.toLong)
      case IntegerType =>
        val v = input.getInt(at); v - java.lang.Math.floorMod(v, w)
      case ShortType =>
        val v = input.getShort(at).toInt
        (v - java.lang.Math.floorMod(v, w)).toShort
      case other => throw new UnsupportedOperationException(
        s"truncate: unsupported key type $other")
    }
  }
}

private[sources] class HammingUnbound extends UnboundFunction {
  override def name(): String = "hamming64"
  override def description(): String =
    "hamming64(bigint, bigint) -> int: popcount(a xor b), the binary-sketch distance"
  override def bind(inputType: StructType): BoundFunction = {
    // any integral widths bind; the declared (bigint, bigint) casts
    val ok = inputType.length == 2 && inputType.fields.forall(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    })
    if (!ok) throw new UnsupportedOperationException(
      s"hamming64 expects (bigint, bigint); got ${inputType.simpleString}")
    new HammingBound
  }
}

private[sources] class HammingBound extends ScalarFunction[java.lang.Integer] {
  override def name(): String = "hamming64"
  override def canonicalName(): String = "graft.hamming64"
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = IntegerType

  def invoke(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  override def produceResult(input: InternalRow): java.lang.Integer =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else invoke(input.getLong(0), input.getLong(1))
}
