package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and a per-partition "decode / feature-extract" stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stand-in (byte-level digest + header
  * probe) — but the Spark plumbing is the real thing: BinaryType column,
  * case-class `Encoder`s, `mapPartitions` with per-partition resource
  * init (one MessageDigest per partition, the same shape a real decoder
  * or model handle would use), and schema-checked output. Swap
  * [[FakeDecoder.features]] for a real codec and nothing else changes.
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
