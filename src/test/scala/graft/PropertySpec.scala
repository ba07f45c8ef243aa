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

  test("zorder2 mask-spread equals the bit-sum definition (the oracle formula)") {
    def naive(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
    check(Prop.forAll(Gen.choose(0L, 70000L), Gen.choose(0L, 70000L)) { (x, y) =>
      graft.functions.ZOrder2.morton(x, y) == naive(x, y)
    })
  }

  test("zorder2 known values: full-x, full-y, both") {
    import graft.functions.ZOrder2.morton
    assert(morton(0xFFFFL, 0L) == 0xAAAAAAAAL)
    assert(morton(0L, 0xFFFFL) == 0x55555555L)
    assert(morton(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    assert(morton(1L, 0L) == 2L)
    assert(morton(0L, 1L) == 1L)
  }

  test("zorder2 preserves quadrant order: top bits of z are the top bits of (x, y)") {
    // The property data skipping relies on: bucketing z by its top 2k
    // bits groups rows into the k-bit quadrant grid of (x, y).
    check(Prop.forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (x, y) =>
      val z = graft.functions.ZOrder2.morton(x, y)
      (z >> 30) == (((x >> 15) << 1) | (y >> 15))
    })
  }

  test("bloom build/probe pair: no false negatives, fp rate within sizing bound") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.functions.BloomProbe.register(spark)
    (0L until 2000L).map(i => s"key_$i").toDF("k").createOrReplaceTempView("__bp_build")
    (0L until 20000L).map(i => s"probe_$i").toDF("k")
      .union(Seq("key_7", "key_1999").toDF("k"))
      .createOrReplaceTempView("__bp_probe")
    val hits = spark.sql(
      """SELECT k FROM __bp_probe
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(k), CAST(100000 AS BIGINT),
        |                           CAST(8388608 AS BIGINT)) FROM __bp_build),
        |  xxhash64(k))""".stripMargin).as[String].collect().toSet
    assert(hits.contains("key_7") && hits.contains("key_1999"),
      "bloom filters must never miss an inserted key")
    // ~84 bits/key sizing → per-probe fpp ≈ 2^-58; 20k probes should FP ~never.
    assert((hits - "key_7" - "key_1999").isEmpty, s"unexpected false positives: $hits")
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

  test("PNG encode->decode recovers the closed-form raster for any doc id") {
    import graft.operators.Multimodal.ImageFixture
    check(Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(ImageFixture.renderPng(id)))
      val w = ImageFixture.widthOf(id)
      val h = ImageFixture.heightOf(id)
      img.getWidth == w && img.getHeight == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          (img.getRGB(x, y) & 0xff) == ImageFixture.grayAt(id, x, y)))
    })
  }

  test("WAV encode->decode recovers the closed-form PCM for any doc id") {
    import graft.operators.Multimodal.AudioFixture
    check(Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(AudioFixture.renderWav(id)))
      val fmt = ais.getFormat
      val nc = AudioFixture.channelsOf(id)
      val n = AudioFixture.nFramesOf(id)
      val bytes = ais.readAllBytes()
      ais.close()
      fmt.getSampleRate.toInt == AudioFixture.sampleRateOf(id) &&
        fmt.getChannels == nc && fmt.getSampleSizeInBits == 16 &&
        bytes.length == n * nc * 2 &&
        (0 until n).forall(f => (0 until nc).forall { c =>
          val off = (f * nc + c) * 2
          ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toInt ==
            AudioFixture.sampleAt(id, c, f)
        })
    })
  }

  // Unicode normalization kernels: idempotence + ASCII fixed point.
  // Inputs mix ASCII with combining marks and precomposed Latin-1.
  private val unicodeString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.choose(32.toChar, 126.toChar),
    Gen.oneOf('\u0301', '\u0300', '\u0308', '\u0303'),
    Gen.oneOf('\u00e1', '\u00e8', '\u00f6', '\u00f1', '\u00df')
  )).map(_.mkString)

  test("nfc and stripAccents are idempotent; ASCII is a fixed point") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.UnicodeNorm
    def u(s: String) = UTF8String.fromString(s)
    check(Prop.forAll(unicodeString) { s =>
      val n1 = UnicodeNorm.nfc(u(s)).toString
      val a1 = UnicodeNorm.stripAccents(u(s)).toString
      UnicodeNorm.nfc(u(n1)).toString == n1 &&
        UnicodeNorm.stripAccents(u(a1)).toString == a1 &&
        // stripping after composing equals stripping directly
        UnicodeNorm.stripAccents(u(n1)).toString == a1
    })
    check(Prop.forAll(asciiString) { s =>
      val x = u(s)
      (UnicodeNorm.nfc(x) eq x) && (UnicodeNorm.stripAccents(x) eq x)
    })
  }
}
