package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Cleaning

/** Golden semantics for the F1–F3 sanitization chain (SURVEY.md §2.8):
  * the reference strips BOTH literal backslash escape sequences and real
  * control characters, after delimiter escaping and non-ASCII removal. */
class CleaningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(ss: String*): Seq[String] =
    ss.toDF("s").select(Cleaning.cleanChain(col("s")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("F1: ';' becomes ','") {
    assert(clean("a;b;c") == Seq("a,b,c"))
  }

  test("F2: non-ASCII (emoji, accents) dropped") {
    assert(clean("oké 😀end") == Seq("ok end"))
  }

  test("F3: literal escape sequences AND real control chars stripped") {
    assert(clean("a\\tb", "a\tb", "x\\ny\r") == Seq("ab", "ab", "xy"))
  }

  test("chain order matches reference (F1 then F2 then F3)") {
    assert(clean("a;\tb\\né\n") == Seq("a,b"))
  }

  test("idempotence: clean(clean(s)) == clean(s) over random strings") {
    val rnd = new scala.util.Random(3)
    val samples = Seq.fill(60)(rnd.alphanumeric.take(8).mkString)
      .map(s => s + Seq(";", "\t", "\\t", "é", "\n", "").apply(rnd.nextInt(6)))
    val once = clean(samples: _*)
    val twice = clean(once: _*)
    assert(once == twice)
  }

  test("F5/S7 day formats") {
    val df = Seq("2024-03-05 17:30:45").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
      .select(
        Cleaning.dayString(col("ts")).as("d"),
        Cleaning.gaDayString(col("ts")).as("ga"))
    val r = df.collect().head
    assert(r.getString(0) == "2024/03/05")
    assert(r.getString(1) == "05/03/2024")
  }
}
