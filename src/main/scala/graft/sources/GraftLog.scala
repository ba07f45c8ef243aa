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
}
