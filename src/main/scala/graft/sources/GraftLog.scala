package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The commit log of a VERSIONED catalog table
  * (`TBLPROPERTIES('versioned'='true')`): one `_graft_log/v<N>.json`
  * manifest per commit holding the table's complete live-file list
  * (root-relative path + writer-reported bytes) AFTER that commit.
  *
  * Semantics this buys, and what it costs:
  *
  *  - **Reads list nothing.** The manifest IS the file list: a SELECT
  *    resolves one small JSON instead of walking directories — at a
  *    million-file table that is the difference between one metadata
  *    read and a namenode storm (the Iceberg/Delta argument, on this
  *    engine). Partition leaves, per-leaf files, and size statistics
  *    all derive from manifest entries.
  *  - **DML is logical.** DELETE/TRUNCATE/OVERWRITE/copy-on-write
  *    exclude files from the NEXT manifest; bytes stay on disk until
  *    [[GraftCatalog.vacuumTable]] drops files unreferenced by every
  *    retained version. Zone sidecars ([[CsvZones]]) are kept too —
  *    files are immutable, so a zone entry stays valid for every
  *    version that references its file.
  *  - **Time travel.** `SELECT … FROM t VERSION AS OF n` resolves
  *    manifest n. Crash ordering: data files publish first, the
  *    manifest second — a crash between them leaves orphans no
  *    manifest references (vacuum food), never a manifest naming
  *    missing files.
  *  - **Optimistic concurrency.** Version N is claimed by an atomic
  *    create-no-overwrite of `v<N>.json`; a loser re-reads the winner's
  *    manifest and retries on top of it. Two concurrent APPENDS both
  *    land (their file sets are disjoint — tagged names); conflicting
  *    DML keeps last-writer-wins at the granularity of whole manifests,
  *    stated honestly rather than hidden.
  *
  * The full-list-per-commit shape (vs Iceberg's manifest-list
  * indirection) is a deliberate simplicity/scale trade: one JSON object
  * per live file per commit. At this engine's file granularity (one
  * file per key per write / pinned sortBuckets) manifests stay in the
  * kilobytes; a table accreting toward millions of live files wants the
  * indirection and should say so in its design review.
  */
private[sources] object GraftLog {
  val Dir = "_graft_log"
  private val mapper = new ObjectMapper()

  /** One live file: root-relative publish name + writer-reported bytes
    * (payload size — planner fodder, not an integrity check). */
  case class Entry(rel: String, bytes: Long)

  private def logDir(root: HPath) = new HPath(root, Dir)
  private def manifest(root: HPath, v: Int) =
    new HPath(logDir(root), s"v$v.json")

  def isVersionFile(name: String): Boolean =
    name.startsWith("v") && name.endsWith(".json")

  def versions(root: HPath, conf: Configuration): Seq[Int] = {
    val fs = root.getFileSystem(conf)
    val dir = logDir(root)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).iterator
      .filter(s => s.isFile && isVersionFile(s.getPath.getName))
      .map(_.getPath.getName.stripPrefix("v").stripSuffix(".json").toInt)
      .toSeq.sorted
  }

  def latestVersion(root: HPath, conf: Configuration): Option[Int] =
    versions(root, conf).lastOption

  def read(root: HPath, conf: Configuration, v: Int): Seq[Entry] = {
    val fs = root.getFileSystem(conf)
    val f = manifest(root, v)
    if (!fs.exists(f)) throw new IllegalArgumentException(
      s"graft log: version $v does not exist at $root (available: " +
        s"${versions(root, conf).mkString(", ")})")
    val in = fs.open(f)
    val node = try mapper.readTree(in) finally in.close()
    val files = node.get("files")
    (0 until files.size()).map { i =>
      val e = files.get(i)
      Entry(e.get("rel").asText(), e.get("bytes").asLong())
    }
  }

  /** The current live set — empty for a table with no commits yet. */
  def latest(root: HPath, conf: Configuration): Seq[Entry] =
    latestVersion(root, conf).map(read(root, conf, _)).getOrElse(Nil)

  /** Publishes `next(liveNow)` as the successor manifest. The
    * transform re-runs against the WINNER's live set when another
    * committer claims the version first — append-style transforms
    * compose; the retry cap turns a pathological livelock into a loud
    * error instead of an infinite loop. */
  def commit(root: HPath, conf: Configuration,
             next: Seq[Entry] => Seq[Entry]): Int = {
    val fs = root.getFileSystem(conf)
    fs.mkdirs(logDir(root))
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val base = latestVersion(root, conf)
      val v = base.getOrElse(0) + 1
      val live = base.map(read(root, conf, _)).getOrElse(Nil)
      val entries = next(live)
      val node = mapper.createObjectNode()
      node.put("version", v)
      val arr = node.putArray("files")
      entries.foreach { e =>
        val o = arr.addObject()
        o.put("rel", e.rel)
        o.put("bytes", e.bytes)
      }
      try {
        val out = fs.create(manifest(root, v), false) // atomic claim of v
        try out.write(mapper.writeValueAsBytes(node)) finally out.close()
        return v
      } catch {
        case _: java.io.IOException => () // lost the race; retry on winner
      }
    }
    throw new java.io.IOException(
      s"graft log: could not claim a manifest version at $root after 50 attempts")
  }

  /** Root-relative form of an absolute file path (qualified or not). */
  def relativize(root: HPath, conf: Configuration, abs: String): String = {
    val fs = root.getFileSystem(conf)
    val q = fs.makeQualified(root).toString
    val r = root.toString
    if (abs.startsWith(q)) abs.substring(q.length).dropWhile(_ == '/')
    else if (abs.startsWith(r)) abs.substring(r.length).dropWhile(_ == '/')
    else abs
  }

  /** Key raws of a root-relative publish name (its `k=v` directory
    * segments, nesting order), decoded. */
  def rawsOf(rel: String): Seq[String] =
    rel.split('/').dropRight(1).toSeq.map(seg =>
      PartitionedCsvLayout.decode(seg.substring(seg.indexOf('=') + 1)))
}

/** Stream offset = manifest version already consumed. */
private[sources] case class GraftVersionOffset(version: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** `spark.readStream.table("graft.ns.t")` on a VERSIONED table: the
  * commit log as a streaming source. One micro-batch per manifest
  * range — batch (s, e] serves exactly the files version e references
  * that version s did not (the files the commits in between ADDED).
  * A fresh stream starts at version 0, so its first batch is the whole
  * current table — the load-existing-then-tail shape of every file
  * stream, except here "what exists" is a manifest read, not a
  * directory walk, and "what's new" is exact (tagged names are never
  * reused, so added-file detection can never double-count a rewrite).
  *
  * Append-only contract, stated: DML that REMOVES rows (DELETE,
  * OVERWRITE, the replaced half of copy-on-write) does not retract —
  * downstream sees the rewritten groups' rows again as fresh appends
  * (COW publishes new files) and never sees tombstones. That is the
  * same contract every file-based stream ships; a changefeed with
  * deletes is a different (richer) source, refused rather than faked.
  *
  * VACUUM interplay: planInputPartitions reads the START version's
  * manifest; vacuuming past an unprocessed stream's offset fails that
  * stream LOUDLY with the available-version list (retention must cover
  * consumer lag — the operator contract, not a silent data loss).
  *
  * Partition pruning still applies per batch: key-only pushed filters
  * drop added files by their directory-derived key tuples before any
  * read; payload filters ride the shared in-reader evaluation. */
private[sources] class GraftLogMicroBatchStream(
    path: String,
    keyFields: Seq[org.apache.spark.sql.types.StructField],
    partFilters: Array[org.apache.spark.sql.sources.Filter],
    conf: SerializableHadoopConf,
    factory: org.apache.spark.sql.connector.read.PartitionReaderFactory,
    mkPartition: (Seq[String], String) => org.apache.spark.sql.connector.read.InputPartition)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.InputPartition
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val root = new HPath(path)
  private def current(): Int =
    GraftLog.latestVersion(root, conf.value).getOrElse(0)

  /** AvailableNow pins the end version at stream start: the trigger
    * drains exactly the versions that existed, then stops. */
  @volatile private var availableNowEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(current())

  override def initialOffset(): Offset = GraftVersionOffset(0)
  override def latestOffset(): Offset =
    GraftVersionOffset(availableNowEnd.getOrElse(current()))
  /** Admission control (SupportsTriggerAvailableNow extends it): no
    * rate limit — a manifest version is the natural batch grain. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (e <= s) return Array.empty
    val before: Set[String] =
      if (s == 0) Set.empty
      else GraftLog.read(root, conf.value, s).map(_.rel).toSet
    GraftLog.read(root, conf.value, e).iterator
      .filterNot(x => before(x.rel))
      .flatMap { entry =>
        val raws = GraftLog.rawsOf(entry.rel)
        if (partFilters.forall(CsvFilterEval.eval(_,
            KeyedCsvScan.keyLookup(keyFields, raws))))
          Some(mkPartition(raws, s"$path/${entry.rel}"))
        else None
      }.toArray
  }

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    factory
}
