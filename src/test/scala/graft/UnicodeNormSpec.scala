package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.UnicodeNorm

/** All fixture strings are spelled with \\uXXXX escapes — decomposed
  * (base + combining mark) vs composed forms must be unambiguous in
  * source, never subject to an editor's own normalization. */
class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  // decomposed: base + combining acute/grave/diaeresis/tilde
  private val aDec = "a\u0301"; private val aComp = "\u00e1"
  private val eDec = "e\u0300"; private val eComp = "\u00e8"
  private val oDec = "o\u0308"; private val oComp = "\u00f6"
  private val nDec = "n\u0303"; private val nComp = "\u00f1"

  test("nfc composes combining sequences to precomposed code points") {
    assert(UnicodeNorm.nfc(u(aDec)).toString == aComp)
    assert(UnicodeNorm.nfc(u(eDec)).toString == eComp)
    assert(UnicodeNorm.nfc(u(oDec)).toString == oComp)
    assert(UnicodeNorm.nfc(u(nDec)).toString == nComp)
    // already-NFC input is a fixed point
    assert(UnicodeNorm.nfc(u(aComp + "b")).toString == aComp + "b")
  }

  test("stripAccents removes Mn marks from composed AND decomposed forms") {
    assert(UnicodeNorm.stripAccents(u(aComp + eComp + oComp + nComp)).toString == "aeon")
    assert(UnicodeNorm.stripAccents(u(aDec + eDec)).toString == "ae")
    // non-mark non-ASCII survives (NFC-recomposed): U+00DF sharp s
    assert(UnicodeNorm.stripAccents(u("\u00df")).toString == "\u00df")
  }

  test("stripAccents drops supplementary-plane Mn marks (code-point walk)") {
    // U+1E944 ADLAM ALIF LENGTHENER is category Mn above U+FFFF: a
    // UTF-16 char walk classifies each surrogate half as SURROGATE and
    // leaks the mark through.
    val adlamMark = new String(Character.toChars(0x1E944))
    assert(Character.getType(0x1E944) == Character.NON_SPACING_MARK)
    assert(UnicodeNorm.stripAccents(u("x" + adlamMark + "y")).toString == "xy")
  }

  test("ASCII fast path returns the input instance untouched") {
    val s = u("plain ascii text 123")
    assert(UnicodeNorm.nfc(s) eq s)
    assert(UnicodeNorm.stripAccents(s) eq s)
  }

  test("codegen expressions agree with the static helpers through a plan") {
    UnicodeNorm.register(spark)
    val df = Seq(aDec + " b", "caff" + eDec, "ascii only", "")
      .toDF("t")
      .select(UnicodeNorm.nfcNorm(col("t")).as("n"),
        UnicodeNorm.unaccent(col("t")).as("s"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == (aComp + " b", "a b"))
    assert(rows(1) == ("caff" + eComp, "caffe"))
    assert(rows(2) == ("ascii only", "ascii only"))
    assert(rows(3) == ("", ""))
  }

  test("null passes through") {
    UnicodeNorm.register(spark)
    val df = Seq(Option.empty[String]).toDF("t")
      .select(UnicodeNorm.nfcNorm(col("t")).as("n"),
        UnicodeNorm.unaccent(col("t")).as("s"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
