package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.ImageFixture

/** Invariance pins for the box-filtered integer-DCT perceptual hash
  * (Multimodal.phashOf) — the properties the q_mm_phash_* oracles rely
  * on, asserted at the unit level so a refactor that quietly breaks an
  * invariance fails HERE with a named property, not as an opaque oracle
  * hash mismatch. */
class PHashSpec extends AnyFunSuite {

  private def decode(png: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))

  private def render(id: Long, f: (Int, Int) => Int): Array[Byte] = {
    val w = ImageFixture.widthOf(id)
    val h = ImageFixture.heightOf(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = f(x, y)
      require(g >= 0 && g <= 255, s"gray $g out of range")
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    (0 until 4).map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum

  private def ph(png: Array[Byte]): Array[Long] = Multimodal.phashOf(decode(png))
  private def ah(png: Array[Byte]): Array[Long] = Multimodal.ahashOf(decode(png))

  test("constant brightness shift moves ZERO pHash bits (DC-only)") {
    // +delta on the wrap-free ramp shifts every pixel equally: only the
    // (dropped) DC coefficient changes; all 63 AC bits must hold.
    for (id <- 0L until 60L; delta <- Seq(5, 25, 60)) {
      val base = ph(ImageFixture.renderPngLp(id))
      val lit = ph(render(id, (x, y) => ImageFixture.grayLpAt(id, x, y) + delta))
      assert(hamming(base, lit) == 0, s"doc $id delta $delta")
    }
  }

  test("zero-mean checkerboard noise moves ZERO pHash bits (box-annihilated)") {
    // Every 2x2 window of (+amp,-amp) Nyquist noise sums to 0, so the
    // box prefilter output — and therefore every DCT coefficient — is
    // IDENTICAL, not merely close.
    for (id <- 0L until 60L; amp <- Seq(8, 16, 24, 32)) {
      val base = ph(ImageFixture.renderPngLp(id))
      val noisy = ph(ImageFixture.renderPngNoisy(id, amp))
      assert(hamming(base, noisy) == 0, s"doc $id amp $amp")
    }
  }

  test("composite corruption: pHash stays under threshold, aHash does not") {
    // The q_mm_phash_neardup fixture claim, measured: planted
    // (base, corrupt) pairs stay within Hamming 6 under pHash while
    // aHash pushes most of the corpus past the pHash threshold — the
    // reason the DCT hash is the dedup key for this corruption family.
    var phOver6 = 0
    var ahOver4 = 0
    val n = 200
    for (id <- 0L until n.toLong) {
      val basePng = ImageFixture.renderPngLp(id)
      val corrPng = ImageFixture.renderPngCorrupt(id)
      if (hamming(ph(basePng), ph(corrPng)) > 6) phOver6 += 1
      if (hamming(ah(basePng), ah(corrPng)) > 4) ahOver4 += 1
    }
    assert(phOver6 == 0, s"pHash corrupt-pair distance exceeded 6 for $phOver6/$n")
    assert(ahOver4 > n / 2,
      s"aHash should be broken on this corpus (only $ahOver4/$n over threshold)")
  }

  test("cross-doc pHash distances clear the near-dup threshold with margin") {
    // False-positive floor: distinct docs' hashes must sit well above
    // PHASH_HAMMING_MAX = 4 (measured min 12 over the sf0.01 corpus).
    val ids = (0L until 60L).toArray
    val hs = ids.map(id => ph(ImageFixture.renderPngLp(id)))
    var min = 64
    for (i <- ids.indices; j <- (i + 1) until ids.length)
      min = math.min(min, hamming(hs(i), hs(j)))
    assert(min > 6, s"cross-doc pHash min distance $min too close to threshold")
  }
}
