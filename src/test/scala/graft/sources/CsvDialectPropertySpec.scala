package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round trip of the DSv2 CSV table's dialect: the
  * writer's quoting ([[GraftCsvDialect.quote]]) composed with the
  * reader's streaming parser ([[CsvRecordIterator]]) must be the
  * identity on ARBITRARY records — including fields full of
  * separators, quotes, and CR/LF — because the committed files are the
  * only contract between the two sides. Pure-JVM (no Spark round trip
  * per sample), so hundreds of cases are cheap. */
class CsvDialectPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // Hostile alphabet: dialect metacharacters over-weighted vs plain
  // text; fields may also be NULL (rendered as a bare empty field) or
  // the empty string (rendered quoted, `""` — the two MUST stay
  // distinguishable through the round trip).
  private val str: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.oneOf(';', '"', '\n', '\r'),
      Gen.choose(32.toChar, 126.toChar))).map(_.mkString)
  private val field: Gen[Option[String]] = Gen.frequency(
    1 -> Gen.const(None), 1 -> Gen.const(Some("")), 6 -> str.map(Some(_)))
  private val record: Gen[List[Option[String]]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, field))
  private val table: Gen[List[List[Option[String]]]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, record))

  test("quote → serialize → parse is the identity (null ≠ empty string)") {
    check(Prop.forAll(table) { rows =>
      val serialized = rows.map(r =>
        r.map(_.map(GraftCsvDialect.quote).getOrElse(""))
          .mkString(";") + "\n").mkString
      val parsed = new CsvRecordIterator(
        new java.io.StringReader(serialized), ';').toList
        .map(_.toList.map(Option(_)))
      parsed == rows
    })
  }

  // FOREIGN file fixture (not produced by our writer, which always
  // quotes CR-bearing fields): a bare \r inside an UNQUOTED field is
  // data and must survive byte-for-byte; only \r\n (or a trailing \r at
  // EOF) terminates a record.
  test("foreign file: bare \\r in unquoted fields is data, not a record end") {
    val foreign = "a\rb;mid\r\rdle;c\r\nnext;row\nlast\r"
    val parsed = new CsvRecordIterator(
      new java.io.StringReader(foreign), ';').toList.map(_.toList)
    assert(parsed == List(
      List("a\rb", "mid\r\rdle", "c"),
      List("next", "row"),
      List("last")))
  }

  test("quoting is minimal: plain non-empty fields pass through unquoted") {
    val plain = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose('a', 'z'), Gen.choose('0', '9'), Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(plain) { s => GraftCsvDialect.quote(s) == s })
    assert(GraftCsvDialect.quote("") == "\"\"")
  }
}
