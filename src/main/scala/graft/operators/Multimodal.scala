package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and a per-partition "decode / feature-extract" stage.
  *
  * Two tiers:
  *  - IMAGES are decoded for real: [[packImages]] renders deterministic
  *    PNG bytes with the JDK's pure-Java codec (`javax.imageio.ImageIO`
  *    — no external library), and [[decodeImages]] decodes those bytes
  *    back per partition, emitting width/height/band-count/pixel
  *    checksums read from the DECODED raster. Because PNG is lossless
  *    and the pixel pattern is a closed-form function of `doc_id`, the
  *    decoded metadata is exactly reproducible in SQL — the oracle
  *    replays the formula, so a wrong decode cannot hash green.
  *  - AUDIO/VIDEO-style payloads (no codec in the JDK) keep the
  *    clearly-marked deterministic stand-in ([[FakeDecoder.features]]:
  *    byte-level digest + header probe) — the Spark plumbing around it
  *    (BinaryType column, case-class `Encoder`s, `mapPartitions` with
  *    per-partition handle init, schema-checked output) is the
  *    production shape; swap the digest for a codec call and nothing
  *    else changes.
  */
object Multimodal {

  case class Media(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, payload_len: Long,
                           payload_md5: String, first_byte: Long)

  /** Pack a text column into a binary payload column (stand-in for
    * image/audio bytes read from object storage). */
  def packPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  object FakeDecoder {
    /** STUB decode: real codecs are unavailable in this environment, so
      * features are a deterministic byte-level digest. The signature —
      * bytes in, typed features out, per-partition handle — is the
      * production shape. */
    def features(md: MessageDigest, m: Media): MediaFeatures = {
      md.reset()
      val digest = md.digest(m.payload).map("%02x".format(_)).mkString
      MediaFeatures(m.doc_id, m.payload.length.toLong, digest,
        if (m.payload.nonEmpty) m.payload(0).toLong & 0xff else -1L)
    }
  }

  /** Per-partition feature extraction: one decoder handle per partition,
    * streamed over the iterator (never materializes a partition). */
  def extractFeatures(spark: SparkSession, packed: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    packed.as[Media].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map(FakeDecoder.features(md, _))
    }
  }

  /** Deterministic image fixture: dimensions and a gray ramp derived
    * from `doc_id` alone, so both the Spark decode path and the DuckDB
    * oracle can compute the expected metadata independently. Kept tiny
    * (≤16×14) — the point is a REAL codec round trip, not pixel volume. */
  object ImageFixture {
    def widthOf(docId: Long): Int = (8 + docId % 9).toInt
    def heightOf(docId: Long): Int = (8 + docId % 7).toInt
    def grayAt(docId: Long, x: Int, y: Int): Int =
      ((docId + 31L * x + 7L * y) % 256).toInt

    /** Render the doc's pixel pattern and ENCODE it as real PNG bytes
      * via the JDK's built-in codec (r = g = b = gray ramp). */
    def renderPng(docId: Long): Array[Byte] = {
      val w = widthOf(docId)
      val h = heightOf(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = grayAt(docId, x, y)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  case class ImageMedia(doc_id: Long, png: Array[Byte])
  case class DecodedImage(doc_id: Long, width: Long, height: Long,
                          channels: Long, pixel_sum: Long, pixel_checksum: Long)

  /** One PNG payload per document — the binary image column a real
    * table would carry (here generated in-engine so the decode is
    * verifiable; in production these bytes arrive from object storage).
    * Narrow per-partition encode, no shuffle. */
  def packImages(spark: SparkSession, docs: DataFrame): Dataset[ImageMedia] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(
      _.map(id => ImageMedia(id, ImageFixture.renderPng(id))))
  }

  /** REAL image decode: `ImageIO.read` each PNG payload per partition
    * and report metadata measured from the DECODED raster — dimensions,
    * band count, and two pixel checksums (plain sum + position-weighted
    * sum). PNG being lossless, these equal the fixture's closed-form
    * pixel function, which the DuckDB oracle replays — a broken decode
    * (wrong dims, channel order, row stride) cannot hash green.
    * Scale: narrow mapPartitions, one decoder call per row, output is
    * six fixed-width columns per image regardless of payload size. */
  def decodeImages(spark: SparkSession, packed: Dataset[ImageMedia]): Dataset[DecodedImage] = {
    import spark.implicits._
    packed.mapPartitions(_.map { m =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.png))
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var chk = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val gray = img.getRGB(x, y) & 0xff // r == g == b in the fixture
          sum += gray
          chk += gray.toLong * (y.toLong * w + x + 1)
          x += 1
        }
        y += 1
      }
      DecodedImage(m.doc_id, w.toLong, h.toLong,
        img.getRaster.getNumBands.toLong, sum, chk)
    })
  }

  case class ResizedMedia(doc_id: Long, orig_len: Long, resized_len: Long,
                          resized_md5: String)

  /** "Resize" a binary payload by keeping every `factor`-th byte — the
    * deterministic stand-in for an image/audio downsample (no codecs in
    * this environment; a real resize swaps the byte stride for a codec
    * call with the identical typed mapPartitions plumbing). */
  def resizePayloads(spark: SparkSession, packed: DataFrame,
                     factor: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    packed.as[Media].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        val small = Array.tabulate(
          (m.payload.length + factor - 1) / factor)(i => m.payload(i * factor))
        md.reset()
        ResizedMedia(m.doc_id, m.payload.length.toLong, small.length.toLong,
          md.digest(small).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Frame sampling over a binary payload: treat the payload as
    * `frameSize`-byte frames and keep every `stride`-th one (the
    * video-frame-sampling shape). Pure Column algebra — binary
    * `substring` + one generator per row, fully codegen'd, no UDF; a
    * real container format would swap the fixed-size slicing for a
    * codec's frame index, leaving the plan shape unchanged. Payloads
    * shorter than one frame yield no rows. */
  def sampleFrames(packed: DataFrame, frameSize: Int, stride: Int): DataFrame =
    packed
      .withColumn("n_frames", floor(length(col("payload")) / frameSize).cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L),
          floor((col("n_frames") - 1) / stride).cast("long"))).as("i"))
      .select(col("doc_id"), (col("i") * stride).as("frame_no"),
        md5(expr(s"substring(payload, cast(i * $stride * $frameSize + 1 as int), $frameSize)"))
          .as("frame_md5"))
}
