package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.Num

/** Structured Streaming surface. The reference is batch-only (`@daily`
  * Airflow reruns, SURVEY.md §2.13); these are the streaming-idiomatic
  * supersets: the same tumbling aggregation runs identically over a
  * batch DataFrame (oracle-checkable) and a `readStream` source with a
  * watermark (exercised in StreamingSpec against the batch result).
  */
object StreamOps {

  /** Hourly tumbling window aggregate per event type — works on batch
    * and streaming inputs alike (same Catalyst plan family). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** The events table as a stream: parquet `FileStreamSource` needs a
    * directory, so the single table file is selected out of the shared
    * sfDir with a glob; the ts-encoding normalization (nanos-long /
    * TIMESTAMP_NTZ / native) is shared with `Tables.events` — a
    * watermark requires a true `TimestampType` column, so NTZ must be
    * cast here too (session pinned UTC → value-preserving). */
  private[graft] def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    graft.Tables.normalizeTs(raw)
  }

  /** Streaming variant: parquet source + 2-hour watermark (bounds state
    * at scale; the deterministic test feed has no late data, so the
    * streaming result must equal the batch result exactly). */
  def tumblingHourlyStream(spark: SparkSession, dir: String): DataFrame =
    tumblingHourly(eventsStream(spark, dir).withWatermark("ts", "2 hours"))

  /** Streaming exact dedup — the streaming face of `Dedup.exact`: the
    * feed is deliberately doubled (each event ×2), and stateful
    * `dropDuplicates` on the key emits each event exactly once. In
    * production add `withWatermark` (or `dropDuplicatesWithinWatermark`)
    * so the seen-keys state stays bounded to the late-data horizon. */
  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withColumn("copy", explode(array(lit(1), lit(2))))
      .select("event_id", "user_id", "ts")
      .dropDuplicates("event_id")

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * drops a key's dedup state once the watermark passes it, so state
    * size is the keys-per-horizon rate, not the stream's lifetime key
    * count — the only dedup shape that survives an unbounded stream.
    * The feed is doubled like [[dedupStream]]; with no late data the
    * result equals the batch distinct set exactly (StreamingSpec). */
  def dedupWithinWatermarkStream(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withColumn("copy", explode(array(lit(1), lit(2))))
      .select("event_id", "user_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id")

  /** The oracle-checkable batch face of horizon-bounded dedup: the first
    * event per (user, event_type) within each hourly tumbling window —
    * what a deduped-at-the-horizon stream retains when the key is
    * (user, type) and the horizon is the hour. Ranking windows partition
    * by (user, type, hour), so no partition exceeds one key-hour. */
  def firstPerKeyHourBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"), col("h"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("h", date_trunc("hour", col("ts")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_id").as("first_event"))
  }

  /** Sliding 2-hour windows every hour — each event lands in exactly two
    * windows. Batch face is oracle-checkable (union of the two grid
    * alignments); streaming face works unchanged. */
  def sliding2hHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Streaming session windows (gap-based) per user — the streaming twin
    * of [[graft.operators.Warehouse.sessionize]], via the native
    * `session_window` state operator. The spec runs it complete-mode
    * over the finite parquet feed (no watermark → every session emits),
    * proving parity with the batch sessionize; a production deployment
    * adds `withWatermark` + append mode so session state stays bounded. */
  def sessionizedStream(spark: SparkSession, dir: String, gapSec: Long): DataFrame =
    eventsStream(spark, dir)
      .groupBy(session_window(col("ts"), s"$gapSec seconds").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: purchases matched to the same user's
    * signups within the preceding hour. Both sides carry watermarks and
    * the join condition bounds the event-time distance, so each side's
    * buffered state is limited to the watermark horizon — the canonical
    * scalable stream-stream join shape. Inner join → matches emit as
    * soon as both sides arrive. */
  def purchasesNearSignupsStream(spark: SparkSession, dir: String): DataFrame = {
    val signups = eventsStream(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val purchases = eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(signups,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 1 hour"))
      .select(col("p_id"), col("p_user"),
        date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
  }

  /** The batch twin of [[purchasesNearSignupsStream]] for parity specs. */
  def purchasesNearSignupsBatch(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    purchases.join(signups,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 1 hour"))
      .select(col("p_id"), col("p_user"),
        date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
  }

  /** Streaming → JDBC warehouse via `foreachBatch`: each micro-batch
    * overwrites the aggregate table with the current complete-mode
    * counts — the standard bridge from a stream to any batch sink Spark
    * has no native streaming writer for (the streaming face of the K3
    * warehouse load). Returns the started query; callers stop it. */
  def aggToJdbcStream(spark: SparkSession, dir: String, url: String,
                      table: String): org.apache.spark.sql.streaming.StreamingQuery =
    eventsStream(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").format("jdbc")
          .option("url", url).option("dbtable", table)
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
          .save()
      }
      .start()

  /** Incremental corpus-vs-batch dedup at STREAMING cadence — the
    * streaming face of [[graft.operators.Dedup.minhashLshAgainstCorpus]]
    * (round-6 verdict #8): new documents arrive as a parquet file
    * stream (one staged file per ingest wave), and each micro-batch is
    * flagged against a PREBUILT corpus band index inside `foreachBatch`
    * — the standard bridge, because each flagging is a batch join
    * pipeline. Per-ingest cost ∝ the micro-batch (bands + candidate
    * joins); the corpus state is built once before the stream starts
    * and never recomputed. Flagged best-match rows append to a parquet
    * sink; each batch's checkpoint blocks are freed as soon as its rows
    * are written, so an unbounded stream accumulates no state beyond
    * the corpus index. Caller stops the query and releases the index
    * ([[graft.operators.Dedup.releaseCorpusIndex]]).
    *
    * Exactly-once across failure/restart: `foreachBatch` gives
    * at-least-once delivery — a crash after the sink write but before
    * the checkpoint commit re-executes the batch on restart — so the
    * write is IDEMPOTENT per `batchId` ([[idempotentParquetWrite]]): a
    * re-executed batch overwrites its own partition directory instead
    * of appending duplicates. Pass `checkpointDir` to make restarts
    * resume from the recorded offsets (StreamingSpec kills a run
    * mid-feed, deletes the commit marker to force a true batch
    * re-execution, restarts, and asserts equality with the
    * uninterrupted run). */
  def incrementalDedupStream(spark: SparkSession, stagingDir: String,
                             schema: org.apache.spark.sql.types.StructType,
                             index: graft.operators.Dedup.CorpusIndex,
                             minJ: Double, outPath: String,
                             checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val flagged = graft.operators.Dedup.flagAgainstCorpusIndex(
            graft.operators.Dedup.wordShingles(batch), index, minJ)
          idempotentParquetWrite(flagged, outPath, batchId)
          graft.operators.Lifecycle.release(flagged)
        },
      checkpointDir).start()

  /** Idempotent per-micro-batch parquet write: each batch overwrites
    * its OWN `batch_id=<id>` partition directory, so a re-executed
    * batch (the at-least-once replay `foreachBatch` gives after a
    * crash between sink write and checkpoint commit) lands byte-
    * identical output instead of appended duplicates — the standard
    * exactly-once bridge for a deterministic batch function. The
    * partition-style directory name makes a plain
    * `spark.read.parquet(outPath)` discover `batch_id` as a column
    * (which wave produced each row — useful lineage in itself). */
  private def idempotentParquetWrite(batch: DataFrame, outPath: String,
                                     batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")

  private def withCheckpoint(
      w: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
      checkpointDir: Option[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d))

  /** Distribution-drift MONITOR at streaming cadence — the data-quality
    * sentinel of a production ingest: each micro-batch (one staged
    * ingest wave, carrying its `wave` id) is scored against a PREBUILT
    * reference word histogram
    * ([[graft.operators.TextAnalysis.driftRefHistogram]], persisted by
    * the caller) inside `foreachBatch`, and the per-(wave, lang) KL
    * rows append to a parquet sink — kl_ba spiking on a wave means the
    * ingest drifted (language mix, spam burst, template flood) and the
    * wave can be quarantined BEFORE it pollutes the corpus. Per-wave
    * cost is the wave's own histogram + a keyed join against the
    * reference; the reference is never recomputed. Byte-identical to
    * the batch twin [[graft.operators.TextAnalysis.waveDriftReport]]
    * on the same waves (StreamingSpec pins the equality). */
  def driftMonitorStream(spark: SparkSession, stagingDir: String,
                         schema: org.apache.spark.sql.types.StructType,
                         refHist: DataFrame, outPath: String,
                         checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          idempotentParquetWrite(
            graft.operators.TextAnalysis.klAgainstRef(refHist, batch),
            outPath, batchId)
        },
      checkpointDir).start()

  /** Incremental IMAGE near-dup at streaming cadence — the multimodal
    * twin of [[incrementalDedupStream]]: new images (raw PNG payloads)
    * arrive as a parquet file stream, and each micro-batch is aHashed
    * and probed against a PREBUILT corpus band index
    * ([[graft.operators.Multimodal.FingerprintIndex]]) inside `foreachBatch`.
    * Per-ingest cost is the batch's codec pass + banded candidate joins
    * against the index; the corpus state is built once before the
    * stream starts. Best-match rows append to a parquet sink; each
    * batch's checkpoint blocks are freed as soon as its rows are
    * written. Caller stops the query and releases the index
    * ([[graft.operators.Multimodal.releaseFingerprintIndex]]). */
  def imageNearDupStream(spark: SparkSession, stagingDir: String,
                         schema: org.apache.spark.sql.types.StructType,
                         index: graft.operators.Multimodal.FingerprintIndex,
                         outPath: String,
                         checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          import spark.implicits._
          val hashes = graft.operators.Multimodal.imageAHash(
            spark, batch.as[graft.operators.Multimodal.ImageVariant]).toDF()
          val flagged = graft.operators.Multimodal.flagAgainstFingerprintIndex(
            hashes, index)
          idempotentParquetWrite(flagged, outPath, batchId)
          graft.operators.Lifecycle.release(flagged)
        },
      checkpointDir).start()

  /** Incremental AUDIO near-dup at streaming cadence — the audio twin
    * of [[imageNearDupStream]], completing the text/image/audio
    * incremental-dedup triangle: new clips (raw WAV payloads) arrive
    * as a parquet file stream, each micro-batch is fingerprinted
    * ([[graft.operators.Multimodal.audioFingerprint]] — REAL decode,
    * band-median bits, so trimmed AND re-gained re-uploads still
    * match) and probed against a prebuilt corpus fingerprint band
    * index. The index machinery is [[graft.operators.Multimodal.FingerprintIndex]]
    * verbatim: audio fingerprints share the 4×16-bit [[graft.operators.Multimodal.ImageHash]]
    * layout, so the banded probe is modality-agnostic. Best-match rows
    * append per batch (idempotent per `batch_id` — same exactly-once
    * bridge, StreamingSpec kill/restart-proves it). */
  def audioNearDupStream(spark: SparkSession, stagingDir: String,
                         schema: org.apache.spark.sql.types.StructType,
                         index: graft.operators.Multimodal.FingerprintIndex,
                         outPath: String,
                         checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          import spark.implicits._
          val hashes = graft.operators.Multimodal.audioFingerprint(
            spark, batch.as[graft.operators.Multimodal.AudioClip]).toDF()
          val flagged = graft.operators.Multimodal.flagAgainstFingerprintIndex(
            hashes, index, idOut = "clip_new")
          idempotentParquetWrite(flagged, outPath, batchId)
          graft.operators.Lifecycle.release(flagged)
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING incremental image dedup: like
    * [[imageNearDupStream]], but after each micro-batch is flagged
    * against the index, its fingerprints are ABSORBED into the index
    * ([[graft.operators.Multimodal.absorbIntoFingerprintIndex]]) — so a wave-2
    * re-upload of a wave-1 upload is caught, which a frozen index can
    * never do (the defect class [[Similarity.absorbIvfBatch]] closes
    * for the vector index). Each batch is flagged BEFORE it is
    * absorbed (its members must not match themselves at Hamming 0).
    * `indexRef` holds the advancing index: seed it with the corpus
    * build, release `indexRef.get()` after the stream stops
    * (superseded values share their cached legs with the successor).
    * The batch is hashed once per role (flag + absorb) — a production
    * deployment lands fingerprints in a durable table instead and
    * rebuilds the in-memory index from it at restart, which is also
    * the recovery story for the absorbed state (the checkpoint only
    * replays offsets, not process memory). */
  def imageNearDupAccumStream(spark: SparkSession, stagingDir: String,
                              schema: org.apache.spark.sql.types.StructType,
                              indexRef: java.util.concurrent.atomic.AtomicReference[
                                graft.operators.Multimodal.FingerprintIndex],
                              outPath: String,
                              checkpointDir: Option[String] = None,
                              maxLegs: Int = 24)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          import spark.implicits._
          // Absorb-watermark replay guard (shared by every accum
          // stream): a batch at or below the index's lastBatchId was
          // already flagged, written, AND absorbed before a crash ate
          // the commit marker — the sink write precedes the absorb, so
          // its partition is already correct. Re-running it would flag
          // the batch against its own absorbed copy (self-matches at
          // Hamming 0 / Jaccard 1 overwrite the partition with wrong
          // rows) and double-count the absorb, so the replay is a
          // complete no-op. Holds for a same-process restart (the ref
          // kept the absorbed index) AND for a re-seed from a durable
          // save taken after the absorb (the watermark persists
          // through save/load).
          if (batchId > indexRef.get().lastBatchId) {
            def hashed = graft.operators.Multimodal.imageAHash(
              spark, batch.as[graft.operators.Multimodal.ImageVariant]).toDF()
            val flagged = graft.operators.Multimodal.flagAgainstFingerprintIndex(
              hashed, indexRef.get())
            idempotentParquetWrite(flagged, outPath, batchId)
            graft.operators.Lifecycle.release(flagged)
            val absorbed = graft.operators.Multimodal.absorbIntoFingerprintIndex(
              indexRef.get(), hashed)
            // Bound the leg count on an unbounded stream: past the budget,
            // materialize the lazy unions into fresh single legs (probe
            // results unchanged) so block-manager entries and per-probe
            // union fanout stay O(1) in stream lifetime.
            indexRef.set(
              (if (absorbed.cached.length >= maxLegs)
                graft.operators.Multimodal.compactFingerprintIndex(absorbed)
              else absorbed).copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING incremental AUDIO dedup — the audio face of
    * [[imageNearDupAccumStream]] (the two share the modality-agnostic
    * [[graft.operators.Multimodal.FingerprintIndex]] over the 4×16-bit hash
    * layout): each micro-batch of clips is fingerprinted, flagged
    * against the index, landed idempotently (with the audio column
    * names), then ABSORBED with the shared maxLegs compaction budget. */
  def audioNearDupAccumStream(spark: SparkSession, stagingDir: String,
                              schema: org.apache.spark.sql.types.StructType,
                              indexRef: java.util.concurrent.atomic.AtomicReference[
                                graft.operators.Multimodal.FingerprintIndex],
                              outPath: String,
                              checkpointDir: Option[String] = None,
                              maxLegs: Int = 24)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          import spark.implicits._
          // Absorb-watermark replay guard — see [[imageNearDupAccumStream]].
          if (batchId > indexRef.get().lastBatchId) {
            def hashed = graft.operators.Multimodal.audioFingerprint(
              spark, batch.as[graft.operators.Multimodal.AudioClip]).toDF()
            val flagged = graft.operators.Multimodal.flagAgainstFingerprintIndex(
              hashed, indexRef.get(), idOut = "clip_new")
            idempotentParquetWrite(flagged, outPath, batchId)
            graft.operators.Lifecycle.release(flagged)
            val absorbed = graft.operators.Multimodal.absorbIntoFingerprintIndex(
              indexRef.get(), hashed)
            indexRef.set(
              (if (absorbed.cached.length >= maxLegs)
                graft.operators.Multimodal.compactFingerprintIndex(absorbed)
              else absorbed).copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING incremental text dedup — the text face of
    * [[imageNearDupAccumStream]]: each micro-batch of documents is
    * flagged against the corpus index, then its shingles are ABSORBED
    * ([[graft.operators.Dedup.absorbIntoCorpusIndex]]) so later waves
    * also match against it. Flag-before-absorb keeps a batch from
    * matching itself. Same `indexRef` / release / durable-table
    * restart contract as the image variant. */
  def incrementalDedupAccumStream(spark: SparkSession, stagingDir: String,
                                  schema: org.apache.spark.sql.types.StructType,
                                  indexRef: java.util.concurrent.atomic.AtomicReference[
                                    graft.operators.Dedup.CorpusIndex],
                                  minJ: Double, outPath: String,
                                  checkpointDir: Option[String] = None,
                                  maxLegs: Int = 36)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // Absorb-watermark replay guard — see [[imageNearDupAccumStream]].
          if (batchId > indexRef.get().lastBatchId) {
            def shingled = graft.operators.Dedup.wordShingles(batch)
            val flagged = graft.operators.Dedup.flagAgainstCorpusIndex(
              shingled, indexRef.get(), minJ)
            idempotentParquetWrite(flagged, outPath, batchId)
            graft.operators.Lifecycle.release(flagged)
            val absorbed = graft.operators.Dedup.absorbIntoCorpusIndex(
              indexRef.get(), shingled)
            // Same leg budget as the image variant: compaction keeps an
            // unbounded stream's cached-leg count O(1), probe-identical.
            indexRef.set(
              (if (absorbed.cached.length >= maxLegs)
                graft.operators.Dedup.compactCorpusIndex(absorbed)
              else absorbed).copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING EMBEDDING near-dup at streaming cadence — the
    * vector face of [[incrementalDedupAccumStream]]: each arriving
    * embedding batch is flagged against the hyperplane-LSH index
    * ([[graft.operators.Dedup.flagAgainstEmbeddingIndex]] — banded
    * candidates, exact-cosine verify), the flags land idempotently,
    * then the batch is absorbed so later waves match against it too.
    * Same leg budget / compaction / durable-table restart contract as
    * the text variant. */
  def embedNearDupAccumStream(spark: SparkSession, stagingDir: String,
                              schema: org.apache.spark.sql.types.StructType,
                              indexRef: java.util.concurrent.atomic.AtomicReference[
                                graft.operators.Dedup.EmbeddingIndex],
                              minCos: Double, outPath: String,
                              checkpointDir: Option[String] = None,
                              maxLegs: Int = 24)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // Absorb-watermark replay guard — see [[imageNearDupAccumStream]].
          if (batchId > indexRef.get().lastBatchId) {
            val flagged = graft.operators.Dedup.flagAgainstEmbeddingIndex(
              batch, indexRef.get(), minCos)
            idempotentParquetWrite(flagged, outPath, batchId)
            graft.operators.Lifecycle.release(flagged)
            val absorbed = graft.operators.Dedup.absorbIntoEmbeddingIndex(
              indexRef.get(), batch)
            indexRef.set(
              (if (absorbed.cached.length >= maxLegs)
                graft.operators.Dedup.compactEmbeddingIndex(absorbed)
              else absorbed).copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING IVF maintenance at streaming cadence — the
    * vector face of [[incrementalDedupAccumStream]]: each arriving
    * embedding batch is scored against the ADVANCING index
    * ([[graft.operators.Similarity.ivfReassign]] — the per-list
    * staleness report a serving pipeline watches for re-centroid
    * decisions), the report lands idempotently per `batch_id`, and the
    * batch is absorbed ([[graft.operators.Similarity.absorbIvfBatch]])
    * so the NEXT wave's growth/drift reads against everything already
    * ingested, not the original build forever. No leg budget needed:
    * absorb merges |centroids|-row stats and releases the superseded
    * frame, so index state is O(|centroids|) regardless of stream
    * lifetime. Restart: the in-memory index is process state — seed
    * `indexRef` from [[graft.operators.Similarity.loadIvfIndex]] and
    * save after ([[graft.operators.Similarity.saveIvfIndex]]); the
    * checkpoint replays offsets only. */
  def ivfMonitorAccumStream(spark: SparkSession, stagingDir: String,
                            schema: org.apache.spark.sql.types.StructType,
                            indexRef: java.util.concurrent.atomic.AtomicReference[
                              graft.operators.Similarity.IvfIndex],
                            outPath: String,
                            checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // Absorb-watermark replay guard — see [[imageNearDupAccumStream]].
          // Here it is the ONLY possible guard: corpusStats retains no
          // vec_ids to anti-join a replayed batch away, so without the
          // watermark a replay double-counts old_size/sim_sum forever.
          if (batchId > indexRef.get().lastBatchId) {
            idempotentParquetWrite(
              graft.operators.Similarity.ivfReassign(indexRef.get(), batch),
              outPath, batchId)
            indexRef.set(graft.operators.Similarity.absorbIvfBatch(
              indexRef.get(), batch).copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING sketch-ANN SERVING stream — the retrieval face
    * of [[embedNearDupAccumStream]]: each arriving embedding batch is
    * answered top-k against the sketch index
    * ([[graft.operators.Similarity.topKAgainstSketchIndex]] — query
    * sketches broadcast, one xor+popcount pass over the corpus legs,
    * exact-cosine re-rank), the answers land idempotently per
    * `batch_id`, then the batch is ABSORBED
    * ([[graft.operators.Similarity.absorbIntoSketchIndex]]) so later
    * queries retrieve against everything already ingested — the
    * "index the traffic" serving pattern. Same answer-before-absorb
    * ordering (a batch must not retrieve itself), leg budget /
    * compaction, `lastBatchId` replay guard, and durable
    * save/load restart contract as the rest of the accum family. */
  def hammingAnnAccumStream(spark: SparkSession, stagingDir: String,
                            schema: org.apache.spark.sql.types.StructType,
                            indexRef: java.util.concurrent.atomic.AtomicReference[
                              graft.operators.Similarity.SketchIndex],
                            k: Int, outPath: String,
                            checkpointDir: Option[String] = None,
                            maxLegs: Int = 24)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // Absorb-watermark replay guard — see [[imageNearDupAccumStream]].
          if (batchId > indexRef.get().lastBatchId) {
            val ranked = graft.operators.Similarity.topKAgainstSketchIndex(
              batch, indexRef.get(), k)
            idempotentParquetWrite(ranked, outPath, batchId)
            graft.operators.Lifecycle.release(ranked)
            val absorbed = graft.operators.Similarity.absorbIntoSketchIndex(
              indexRef.get(), batch)
            indexRef.set(
              (if (absorbed.cached.length >= maxLegs)
                graft.operators.Similarity.compactSketchIndex(absorbed)
              else absorbed).copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  /** SELF-ACCUMULATING KMV cardinality sentinel — the sketch face of
    * the accumulating-index family, and the one member that is
    * replay-safe WITHOUT the absorb watermark: KMV merge is set-union
    * + k-min, which is IDEMPOTENT, so a checkpoint-replayed batch
    * folds to the bit-identical sketch (the guard below only skips
    * redundant WORK — correctness does not depend on it, and
    * StreamingSpec re-absorbs a batch with the guard bypassed to pin
    * exactly that). Each micro-batch of documents: absorb into the
    * per-source trigram-cardinality sketch
    * ([[graft.operators.TextAnalysis.absorbIntoKmvIndex]] — O(sources·k)
    * state, absorb IS compaction), then land the post-absorb
    * cardinality card idempotently (partition = batch_id, so the
    * highest partition is the current dataset card). */
  /** SELF-ACCUMULATING DSIR selection — continuous data selection at
    * ingestion cadence: each arriving wave is SCORED against the
    * current feature state (pre-absorb, the family convention), landed
    * idempotently, then its token counts are absorbed into the raw
    * histogram so later waves score against sharper importance
    * weights. Absorb is count-addition (not idempotent), so the
    * `lastBatchId` watermark guards checkpoint replays exactly like
    * the dedup/image/audio/embedding/IVF members; the sink write
    * precedes the absorb, so a replayed batch's partition is already
    * correct and the replay is a complete no-op. State is two
    * ≤buckets-row histograms — O(1) legs by construction. */
  def dsirSelectionStream(spark: SparkSession, stagingDir: String,
                          schema: org.apache.spark.sql.types.StructType,
                          indexRef: java.util.concurrent.atomic.AtomicReference[
                            graft.operators.TextAnalysis.DsirIndex],
                          outPath: String,
                          checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (batchId > indexRef.get().lastBatchId) {
            val scored = graft.operators.TextAnalysis
              .scoreAgainstDsirIndex(indexRef.get(), batch)
            idempotentParquetWrite(scored, outPath, batchId)
            indexRef.set(graft.operators.TextAnalysis
              .absorbIntoDsirIndex(indexRef.get(), batch)
              .copy(lastBatchId = batchId))
          }
        },
      checkpointDir).start()

  def kmvCardinalityAccumStream(spark: SparkSession, stagingDir: String,
                                schema: org.apache.spark.sql.types.StructType,
                                indexRef: java.util.concurrent.atomic.AtomicReference[
                                  graft.operators.TextAnalysis.KmvIndex],
                                outPath: String,
                                checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    withCheckpoint(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stagingDir)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (batchId > indexRef.get().lastBatchId) {
            val absorbed = graft.operators.TextAnalysis
              .absorbIntoKmvIndex(indexRef.get(), batch)
              .copy(lastBatchId = batchId)
            // Sink write BEFORE the watermark moves (the family-wide
            // ordering): if the write throws, the ref is untouched and
            // the replayed batch re-absorbs — harmless, KMV merge is
            // idempotent — and re-writes. The inverted order would
            // skip the replay and lose the batch's card forever.
            idempotentParquetWrite(
              graft.operators.TextAnalysis.kmvCardinalityReport(absorbed),
              outPath, batchId)
            indexRef.set(absorbed)
          }
        },
      checkpointDir).start()

  case class UserEvent(user_id: Long, value: Double)
  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Canonicalize an accumulated double before comparing it: group
    * iterators (and batch partial-merges) present values in an
    * unspecified order, so two runs of the same data can differ by ulps
    * — rounding to 6 decimals makes the threshold-crossing decision
    * order-independent (matching the engine-wide dsum/round-6 oracle
    * discipline). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Variable-arity keyed state via flatMapGroupsWithState: emit a row
    * ONLY for users whose running total crosses `threshold` in this
    * batch (0 or 1 rows per group per invocation — the shape
    * mapGroupsWithState's exactly-one-row contract can't express).
    * Alert-style monitoring over keyed state. The crossing test runs on
    * [[round6]]-canonicalized totals so it cannot flip with the
    * accumulation order. */
  def thresholdAlerts(spark: SparkSession, events: DataFrame,
                      threshold: Double): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          it.foreach { e => n += 1; total += e.value }
          state.update(UserRunning(uid, n, total))
          if (round6(prev.total) < threshold && round6(total) >= threshold)
            Iterator(UserRunning(uid, n, total))
          else Iterator.empty
      }
      .toDF()
  }

  /** Threshold shared by [[thresholdAlerts]]'s spec and the
    * `q_st_threshold_alerts` query + oracle. */
  val AlertThreshold: Double = 100.0

  /** The oracle-checkable batch face of [[thresholdAlerts]]: for each
    * user, the event at which the running total — accumulated in event
    * order (ts, event_id) — first crosses `threshold`, with the total
    * at that moment. The cumulative sum runs in DECIMAL(18,6), so the
    * running values are exact and identical on any engine (a double
    * cumulative sum would drift by ulps between implementations). The
    * window partitions by user, so no partition ever exceeds one user's
    * events — scale-safe. */
  def thresholdCrossingsBatch(events: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("cum", sum(col("v")).over(w))
      .filter(col("cum") - col("v") < threshold && col("cum") >= threshold)
      .select(col("user_id"), col("event_id").as("crossing_event"),
        round(col("cum").cast("double"), 6).as("total_at_crossing"))
  }

  /** Spark 4's arbitrary-state API: the [[runningPerUser]] aggregate as
    * a `StatefulProcessor` over `transformWithState` — typed ValueState
    * per key, explicit init/handle lifecycle, RocksDB-backed state
    * store. This is the current-generation replacement for
    * mapGroupsWithState (composable state variables, timers, TTL); the
    * spec proves it emits the same totals as the batch aggregate. */
  class RunningTotalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserRunning] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var state: ValueState[UserRunning] = _
    override def init(outputMode: streaming.OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning]("running",
        Encoders.product[UserRunning], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[UserRunning] = {
      val prev = if (state.exists()) state.get() else UserRunning(key, 0L, 0.0)
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserRunning(key, n, total)
      state.update(next)
      Iterator(next)
    }
  }

  /** [[RunningTotalProcessor]] wired over the parquet feed (requires the
    * RocksDB state store provider — set in the spec's session confs). */
  def runningPerUserTws(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    eventsStream(spark, dir)
      .select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Custom keyed state via mapGroupsWithState: running per-user count
    * and total (the custom-state analogue of the reference's count
    * accumulation, SURVEY.md §2.5 A6). */
  def runningPerUser(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          it.foreach { e => n += 1; total += e.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
      .toDF()
  }
}
