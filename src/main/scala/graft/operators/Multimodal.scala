package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and a per-partition "decode / feature-extract" stage.
  *
  * Three tiers:
  *  - IMAGES are decoded for real: [[packImages]] renders deterministic
  *    PNG bytes with the JDK's pure-Java codec (`javax.imageio.ImageIO`
  *    — no external library), and [[decodeImages]] decodes those bytes
  *    back per partition, emitting width/height/band-count/pixel
  *    checksums read from the DECODED raster. Because PNG is lossless
  *    and the pixel pattern is a closed-form function of `doc_id`, the
  *    decoded metadata is exactly reproducible in SQL — the oracle
  *    replays the formula, so a wrong decode cannot hash green.
  *    [[imageAHash]]/[[imageNearDup]] build on the decoded raster: a
  *    64-bit average hash banded 4×16-bit for LSH-blocked near-dup
  *    detection — the crawl-scale image dedup stage.
  *  - AUDIO is decoded for real too: [[packAudio]] containers
  *    closed-form 16-bit PCM as actual RIFF/WAVE bytes and
  *    [[decodeAudio]] parses them back with the JDK's
  *    `javax.sound.sampled.AudioSystem`, reporting header metadata and
  *    integer signal statistics from the DECODED samples (WAV PCM is
  *    lossless, so the oracle replays the sample formula).
  *  - VIDEO-style payloads (no container codec in the JDK) keep the
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
    /** STUB decode for VIDEO-style payloads: the JDK ships no container
      * codec (images use the real ImageIO path, audio the real
      * AudioSystem path), so features here are a deterministic
      * byte-level digest. The signature — bytes in, typed features out,
      * per-partition handle — is the production shape. */
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
    /** Variant pixel function: the base ramp shifted by `delta`
      * brightness steps (mod 256) — a near-duplicate of the base image
      * for small deltas, used by the perceptual-hash dedup fixture. */
    def grayAt(docId: Long, delta: Int, x: Int, y: Int): Int =
      ((docId + delta + 31L * x + 7L * y) % 256).toInt

    /** Render the doc's pixel pattern and ENCODE it as real PNG bytes
      * via the JDK's built-in codec (r = g = b = gray ramp). */
    def renderPng(docId: Long): Array[Byte] = renderPng(docId, 0)

    def renderPng(docId: Long, delta: Int): Array[Byte] = {
      val w = widthOf(docId)
      val h = heightOf(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = grayAt(docId, delta, x, y)
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
    * verifiable; in production these bytes arrive from object storage,
    * already spread over many files — the repartition below exists only
    * because the FIXTURE derives from one small parquet file). */
  def packImages(spark: SparkSession, docs: DataFrame): Dataset[ImageMedia] = {
    import spark.implicits._
    // The id column rides one tiny shuffle so the codec work spreads
    // over the session's full parallelism — the documents scan is a
    // single small file, and without this every encode+decode of the
    // corpus lands in ONE task (measured 2.6 s -> sub-second at sf0.1).
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => ImageMedia(id, ImageFixture.renderPng(id))))
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

  // ---------------------------------------------------------------- audio

  /** Deterministic audio fixture: 16-bit signed PCM whose every sample
    * is a closed-form function of (doc_id, channel, frame), containered
    * as REAL RIFF/WAVE bytes by the JDK's built-in codec
    * (`javax.sound.sampled.AudioSystem` — pure Java, no external
    * library). WAV PCM is lossless, so a correct decode recovers the
    * formula exactly and the DuckDB oracle can replay it — a broken
    * header parse, byte order, or channel de-interleave cannot hash
    * green. Clips are kept tiny (≤97 frames): the point is the codec
    * round trip, not audio volume. */
  object AudioFixture {
    private val Rates = Array(8000, 11025, 16000, 22050)
    def sampleRateOf(docId: Long): Int = Rates((docId % 4).toInt)
    def nFramesOf(docId: Long): Int = (64 + docId % 33).toInt
    def channelsOf(docId: Long): Int = (1 + docId % 2).toInt
    /** Signed 16-bit sample value for (doc, channel, frame). */
    def sampleAt(docId: Long, ch: Int, i: Int): Int =
      (((docId * 131L + ch * 17L + i * 37L) % 65536L) - 32768L).toInt

    /** Interleave the PCM frames and ENCODE them as a real WAV file. */
    def renderWav(docId: Long): Array[Byte] = {
      val sr = sampleRateOf(docId)
      val n = nFramesOf(docId)
      val nc = channelsOf(docId)
      val pcm = new Array[Byte](n * nc * 2)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < nc) {
          val s = sampleAt(docId, c, i)
          val off = (i * nc + c) * 2
          pcm(off) = (s & 0xff).toByte            // little-endian
          pcm(off + 1) = ((s >> 8) & 0xff).toByte
          c += 1
        }
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sr.toFloat, 16, nc, /*signed=*/ true, /*bigEndian=*/ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  case class AudioMedia(doc_id: Long, wav: Array[Byte])
  case class DecodedAudio(doc_id: Long, sample_rate: Long, channels: Long,
                          bits: Long, n_frames: Long, sample_sum: Long,
                          energy: Long, sample_checksum: Long)

  /** One WAV payload per document (generated in-engine so the decode is
    * verifiable; in production the bytes arrive from object storage,
    * already spread over many files — see [[packImages]] on the
    * fixture-only repartition). */
  def packAudio(spark: SparkSession, docs: DataFrame): Dataset[AudioMedia] = {
    import spark.implicits._
    // Same codec-parallelism shuffle as packImages (see there).
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => AudioMedia(id, AudioFixture.renderWav(id))))
  }

  /** REAL audio decode: `AudioSystem.getAudioInputStream` parses the
    * RIFF/WAVE container per partition; format metadata (rate, channel
    * count, bit depth, frame length) is read from the DECODED header and
    * three integer signal statistics — Σ s, Σ s² (signal energy, the
    * loudness/silence-filter primitive), and a position-weighted
    * checksum — are computed from the DECODED de-interleaved samples.
    * All-integer outputs keep the oracle comparison exact. Scale: narrow
    * mapPartitions, fixed-width output independent of clip length. */
  def decodeAudio(spark: SparkSession, packed: Dataset[AudioMedia]): Dataset[DecodedAudio] = {
    import spark.implicits._
    packed.mapPartitions(_.map { m =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.wav))
      val fmt = ais.getFormat
      val nc = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      // The sample loop below de-interleaves 16-bit little-endian signed
      // PCM; any other encoding would read garbage (or past the buffer),
      // so reject it loudly instead.
      require(bits == 16 && !fmt.isBigEndian &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"decodeAudio supports 16-bit little-endian signed PCM; " +
          s"doc ${m.doc_id} decoded as $fmt")
      val nFrames = ais.getFrameLength
      val bytes = ais.readAllBytes()
      ais.close()
      var sum = 0L
      var energy = 0L
      var chk = 0L
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < nc) {
          val off = (f * nc + c) * 2
          val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toLong
          sum += s
          energy += s * s
          chk += s * (f.toLong * nc + c + 1)
          c += 1
        }
        f += 1
      }
      DecodedAudio(m.doc_id, fmt.getSampleRate.toLong, nc.toLong, bits.toLong,
        nFrames, sum, energy, chk)
    })
  }

  // --------------------------------------- image perceptual-hash dedup

  case class ImageVariant(img_id: Long, doc_id: Long, delta: Int,
                          png: Array[Byte])
  case class ImageHash(img_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Image corpus with planted near-duplicates: every doc contributes
    * its base PNG (img_id = 2·doc_id); docs with doc_id % 5 == 0 also
    * contribute a brightness-shifted re-render (img_id = 2·doc_id + 1,
    * gray + 1 mod 256) — the "same photo, different exposure/re-encode"
    * case a crawl-scale image dedup must catch. */
  def packImageVariants(spark: SparkSession, docs: DataFrame): Dataset[ImageVariant] = {
    import spark.implicits._
    // Same codec-parallelism shuffle as packImages (see there).
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
      val base = ImageVariant(id * 2, id, 0, ImageFixture.renderPng(id, 0))
      if (id % 5 == 0)
        Iterator(base, ImageVariant(id * 2 + 1, id, 1, ImageFixture.renderPng(id, 1)))
      else Iterator(base)
    })
  }

  /** 64-bit average hash (aHash) computed from the REAL decoded raster:
    * nearest-neighbor-sample an 8×8 grid, then bit(cell) = 1 iff the
    * cell is brighter than the grid mean (compared as 64·gray > Σgray —
    * integer-exact, no division). Emitted as four 16-bit bands: the
    * banded layout IS the LSH blocking key for the near-dup join (two
    * images within Hamming distance 6 of each other agree exactly on
    * ≥1 of 4 bands whenever their 6 differing bits fall in ≤3 bands —
    * the standard pigeonhole guarantee). Narrow per-partition decode,
    * fixed-width output. */
  def imageAHash(spark: SparkSession, imgs: Dataset[ImageVariant]): Dataset[ImageHash] = {
    import spark.implicits._
    imgs.mapPartitions(_.map { m =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.png))
      val w = img.getWidth
      val h = img.getHeight
      val cell = new Array[Int](64)
      var total = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val g = img.getRGB(gx * w / 8, gy * h / 8) & 0xff
          cell(gy * 8 + gx) = g
          total += g
          gx += 1
        }
        gy += 1
      }
      val bands = new Array[Long](4)
      var i = 0
      while (i < 64) {
        if (64L * cell(i) > total) bands(i / 16) |= 1L << (i % 16)
        i += 1
      }
      ImageHash(m.img_id, bands(0), bands(1), bands(2), bands(3))
    })
  }

  /** Near-duplicate image pairs by banded aHash: explode each hash into
    * its 4 (band_idx, value) blocking keys, self-join per block, then
    * verify candidates with the exact Hamming distance (`bit_count` of
    * the XOR — codegen'd builtin, no UDF). Scale: the join is keyed on
    * 16-bit band values, so work is Σ bucket² over genuinely-colliding
    * buckets — never corpus²; candidate dedup is a narrow distinct on
    * the pair key. The hash frame is persisted for the self-join (5
    * longs per image — tiny) so the upstream codec pass runs ONCE, not
    * once per join side, and released before returning
    * ([[Dedup.materializeThenRelease]] lifecycle). */
  def imageNearDup(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val h = hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = h.select(col("img_id"), col("b0"), col("b1"),
        col("b2"), col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band_idx", "bval")))
    val a = exploded.toDF(exploded.columns.map("a_" + _).toIndexedSeq: _*)
    val b = exploded.toDF(exploded.columns.map("b_" + _).toIndexedSeq: _*)
    val pairs = a.join(b, col("a_band_idx") === col("b_band_idx") &&
        col("a_bval") === col("b_bval") && col("a_img_id") < col("b_img_id"))
      .select(col("a_img_id").as("img_a"), col("b_img_id").as("img_b"),
        (expr("bit_count(a_b0 ^ b_b0) + bit_count(a_b1 ^ b_b1)") +
          expr("bit_count(a_b2 ^ b_b2) + bit_count(a_b3 ^ b_b3)"))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    Dedup.materializeThenRelease(pairs, h)
  }
}
