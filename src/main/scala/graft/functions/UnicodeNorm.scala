package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for crawl-scale corpus cleaning — the
  * standard preprocessing step every large text pipeline (C4, CCNet,
  * RefinedWeb) runs before dedup/tokenization: canonical composition
  * (NFC) so byte-identical text hashes identically regardless of how
  * the crawler encoded its combining marks, and accent stripping for
  * diacritic-insensitive matching/fingerprinting. The reference
  * pipeline (pandas) gets NFC implicitly from Python's str handling;
  * here it is an explicit, codegen'd engine primitive.
  *
  * Both ops are native codegen [[UnaryExpression]]s (no UDF boxing,
  * inside whole-stage codegen) over `java.text.Normalizer`:
  *
  *  - [[NfcNormalize]] — Unicode NFC canonical composition. Mirrors
  *    DuckDB's `nfc_normalize` (the oracle side).
  *  - [[StripAccents]] — NFD-decompose, drop every non-spacing
  *    combining mark (Unicode category Mn), NFC-recompose the rest.
  *    Mirrors DuckDB's utf8proc-backed `strip_accents` on the Latin
  *    diacritic range (the fixture's domain).
  *
  * 100 TB shape: per-row scalar, no shuffle impact; the ASCII fast
  * path below is the production property — web-scale English text is
  * overwhelmingly pure ASCII, and an all-ASCII string is returned
  * UNTOUCHED (reference equality, zero allocation, no String
  * round-trip), so the normalization pass costs one byte scan per row
  * on the common path and pays the Normalizer only on rows that can
  * actually change.
  */
object UnicodeNorm {

  /** True iff every byte is ASCII (no UTF-8 lead/continuation bytes) —
    * such strings are fixed points of NFC and of accent stripping. */
  private def allAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) return false
      i += 1
    }
    true
  }

  /** NFC canonical composition; ASCII fast path returns the input. */
  def nfc(s: UTF8String): UTF8String = {
    if (allAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD → drop Mn marks → NFC. ASCII fast path returns the input.
    * Iterates CODE POINTS, not UTF-16 chars: supplementary-plane
    * combining marks (e.g. the Adlam U+1E944..U+1E94A block) are
    * category Mn too, and a char-wise walk would classify each
    * surrogate half as SURROGATE and let the mark through. */
  def stripAccents(s: UTF8String): UTF8String = {
    if (allAscii(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  def nfcNorm(c: Column): Column = call_function("nfc_norm", c)
  def unaccent(c: Column): Column = call_function("unaccent", c)

  /** Ad-hoc binding for sessions not built with [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "nfc_norm")(exprs => NfcNormalize(exprs.head))
    Registry.registerOnce(spark, "unaccent")(exprs => StripAccents(exprs.head))
  }
}

/** `nfc_norm(str)` — Unicode NFC canonical composition, codegen'd. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_norm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `unaccent(str)` — diacritic stripping (NFD, drop Mn, NFC), codegen'd. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unaccent"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
