package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Hashing, Poly31Hash, RmseAggregator}

/** Property-based checks (SURVEY.md §5.3) over the pure-JVM kernels —
  * no Spark round trip per sample, so hundreds of cases are cheap.
  * Plain ScalaCheck (Prop + Test.check) since only scalatest+scalacheck
  * are on the offline classpath. */
class PropertySpec extends AnyFunSuite {

  private val asciiString: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("poly31 is deterministic and within the modulus") {
    check(Prop.forAll(asciiString) { s =>
      val h = Poly31Hash.hash(s)
      h == Poly31Hash.hash(s) && h >= 0L && h < Poly31Hash.P
    })
  }

  test("poly31 obeys the one-step recurrence (rolling-hash law)") {
    check(Prop.forAll(asciiString, Gen.choose(32.toChar, 126.toChar)) { (s, c) =>
      Poly31Hash.hash(s + c) ==
        (Poly31Hash.hash(s) * 31L + c.toLong) % Poly31Hash.P
    })
  }

  test("RMSE aggregator merge is associative and order-insensitive") {
    val pairs = Gen.listOf(Gen.zip(
      Gen.choose(-1e6, 1e6), Gen.choose(-1e6, 1e6)))
    check(Prop.forAll(pairs, pairs, pairs) { (a, b, c) =>
      import RmseAggregator._
      def buf(xs: List[(Double, Double)]) = xs.foldLeft(zero)(reduce)
      val left = merge(merge(buf(a), buf(b)), buf(c))
      val right = merge(buf(a), merge(buf(b), buf(c)))
      left._2 == right._2 &&
        math.abs(left._1 - right._1) <= 1e-6 * math.max(1.0, math.abs(left._1))
    })
  }

  test("minhash permutation arithmetic stays in a signed 64-bit long") {
    check(Prop.forAll(Gen.choose(0L, Hashing.M - 1)) { h =>
      Hashing.minhashPerms.forall { case (a, b) =>
        val v = (a * h + b) % Hashing.M
        v >= 0L && v < Hashing.M && a * h >= 0L
      }
    })
  }

  test("GraftExtensions injects dotp/poly31/shingles3 session-wide") {
    // TestSpark sets spark.sql.extensions=graft.GraftExtensions, so the
    // functions resolve in plain SQL with no register() call.
    val spark = TestSpark.spark
    val r = spark.sql(
      """SELECT dotp(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       poly31('ab') AS p,
        |       size(shingles3('a b c d')) AS s""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == (('a'.toLong * 31 + 'b') % graft.functions.Poly31Hash.P))
    assert(r.getInt(2) == 2) // "a b c", "b c d"
  }
}
