package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style partitioned layout for the graft `;`-CSV table — the
  * DSV2-native bucketing story (SURVEY.md §2.13 superset; the
  * storage-partitioned-join design is public Spark, SPARK-37377):
  *
  * WRITE (`option("partitionedBy", "d,src")` — ONE OR MORE key columns,
  * r14): the sink REQUIRES clustering + in-partition ordering on the
  * keys (RequiresDistributionAndOrdering, same contract as `clusterBy`),
  * then each task splits its sorted run into one file per key tuple
  * under nested `d=<v1>/src=<v2>/part-NNNNN.csv` directories. The key
  * columns are carried by the DIRECTORY NAMES, not the payload (hive
  * convention) — a 100 TB table partitioned on grain keys never stores
  * the key bytes per row.
  *
  * READ: the scan plans ONE input partition per LEAF directory, each
  * declaring its key tuple ([[HasPartitionKey]]), and reports
  * [[KeyGroupedPartitioning]] over `identity(k1), identity(k2), …` plus
  * a per-partition ordering on the keys ([[SupportsReportOrdering]] —
  * trivially true: every row in a partition shares the whole tuple).
  * With `spark.sql.sources.v2.bucketing.enabled` the engine then plans
  * joins between two such tables on the keys with ZERO Exchange and
  * ZERO Sort — the storage-partitioned join. At 100 TB this is the
  * bucketed-join economics without a Hive metastore: pay the
  * clustering shuffle once at write time, and every downstream join or
  * aggregation on the grain keys is exchange-free forever.
  *
  * Planning-time partition pruning: pushed filters that mention ONLY
  * key columns — any subset, so a `date=…/source=…` table prunes on a
  * date-only predicate (prefix) or a source-only one — are evaluated
  * against the directory names; pruned leaves are never listed for
  * files, let alone read. Payload filters ride the in-reader pushdown.
  */
private[sources] object PartitionedCsvLayout {
  /** Key-to-directory-name encoding: injective, filesystem-safe, and
    * ORDER-PRESERVING on the raw string for the unreserved charset
    * (hive's escapePathName shape). `%` itself is reserved so decode is
    * unambiguous. */
  def encode(v: String): String = {
    val sb = new StringBuilder
    v.foreach { c =>
      // ASCII-only passthrough: non-ASCII raw directory names depend on
      // the JVM/filesystem charset (sun.jnu.encoding) and round-trip
      // unreliably — every non-ASCII char is %XX-encoded instead.
      if (c < 128 && (c.isLetterOrDigit || c == '.' || c == '-' || c == '_'))
        sb.append(c)
      else c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => sb.append(f"%%${b & 0xff}%02X")) // %XX per UTF-8 byte
    }
    sb.toString
  }

  def decode(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(bytes.write(_))
        i += 1
      }
    }
    new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Partition key types this layout supports (a grain key is a string
    * or an integral — floats make terrible partition keys and are
    * rejected loudly at write time). */
  def keyTypeOk(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | BooleanType => true
    case _ => false
  }

  /** Typed JVM value of a raw (decoded) key string. */
  def keyValue(raw: String, dt: DataType): Any = dt match {
    case StringType => raw
    case LongType => raw.toLong
    case IntegerType => raw.toInt
    case ShortType => raw.toShort
    case BooleanType => raw.toBoolean
    case other => throw new IllegalStateException(s"partition key type $other")
  }

  /** Catalyst form of the key for [[HasPartitionKey]]. */
  def catalystKey(raw: String, dt: DataType): Any = keyValue(raw, dt) match {
    case s: String => UTF8String.fromString(s)
    case v => v
  }

  /** The `<col>=<value>` directories at `path`, if any: (column name,
    * raw decoded value, dir path) sorted by encoded value. Returns an
    * empty array for a flat (non-partitioned) layout. */
  def listKeyDirs(path: String, conf: Configuration): Array[(String, String, String)] = {
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Array.empty
    val dirs = fs.listStatus(root)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
        s.getPath.getName.contains('='))
      .map { s =>
        val n = s.getPath.getName
        val eq = n.indexOf('=')
        (n.substring(0, eq), n.substring(eq + 1), s.getPath.toString)
      }
      // by ENCODED value, as documented — encode() is order-preserving
      // on the unreserved charset, so this is key order for plain keys
      // (nothing downstream is load-bearing on the order; the sort just
      // keeps listings deterministic across filesystems)
      .sortBy(_._2)
      .map { case (c, enc, p) => (c, decode(enc), p) }
    val cols = dirs.map(_._1).distinct
    if (cols.length > 1) throw new IllegalStateException(
      s"graft-csv: mixed partition columns under $path: ${cols.mkString(", ")}")
    dirs
  }

  /** The FULL (possibly nested) partition tree at `path`: the key
    * columns in nesting order plus one entry per LEAF directory with
    * its raw decoded key values. `(Nil, empty)` for a flat layout.
    * Every branch must carry the same column at the same depth and
    * reach the same depth (the writer only produces such trees; a
    * ragged foreign layout fails loudly rather than silently dropping
    * rows). */
  def listPartitionTree(path: String,
                        conf: Configuration): (Seq[String], Array[(Seq[String], String)]) = {
    val level = listKeyDirs(path, conf)
    if (level.isEmpty) return (Nil, Array.empty)
    val col = level.head._1
    var childCols: Seq[String] = null
    val leaves = level.flatMap { case (_, raw, dir) =>
      val (cs, subLeaves) = listPartitionTree(dir, conf)
      if (childCols == null) childCols = cs
      else if (childCols != cs) throw new IllegalStateException(
        s"graft-csv: ragged partition tree under $path — " +
          s"[${childCols.mkString(",")}] vs [${cs.mkString(",")}] at $dir")
      if (cs.isEmpty) Array((Seq(raw), dir))
      else subLeaves.map { case (vs, d) => (raw +: vs, d) }
    }
    (col +: childCols, leaves)
  }
}

/** One leaf directory = one input partition, declaring its key tuple so
  * the engine can group and align partitions across the two sides of a
  * storage-partitioned join. `keySchemaJson` is the StructType (key
  * columns only, nesting order) serialized for the executor side. */
private[sources] case class KeyedCsvPartition(keyRaws: Seq[String],
                                              keySchemaJson: String,
                                              files: Array[String])
    extends InputPartition with HasPartitionKey {
  private[sources] def keySchema: StructType =
    DataType.fromJson(keySchemaJson).asInstanceOf[StructType]
  override def partitionKey(): InternalRow =
    new GenericInternalRow(keySchema.fields.zip(keyRaws).map {
      case (f, raw) => PartitionedCsvLayout.catalystKey(raw, f.dataType)
    }.toArray[Any])
}

private[sources] class KeyedCsvScanBuilder(path: String, full: StructType,
                                           keyCols: Seq[String],
                                           leaves: Array[(Seq[String], String)],
                                           conf: SerializableHadoopConf,
                                           vectorized: Boolean = false,
                                           nullFill: Boolean = false,
                                           zoneSkip: Boolean = true,
                                           manifestFiles: Option[Map[String, Array[(String, Long)]]] = None,
                                           maxVersionsPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private val keyFields: Seq[StructField] = keyCols.map(c =>
    full.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
      throw new IllegalArgumentException(
        s"graft-csv partitioned read: schema lacks partition column '$c' " +
          s"(layout at $path); pass a schema containing it")))
  private val keySchema = StructType(keyFields)
  /** The payload face: everything the part files actually store. */
  private val payload = StructType(full.fields.filterNot(f =>
    keyCols.exists(_.equalsIgnoreCase(f.name))))

  private var required: StructType = full
  private var partFilters: Array[Filter] = Array.empty
  private var payloadFilters: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** PARTIAL limit per leaf-directory partition (same contract as the
    * flat scan); the engine's CollectLimit finishes globally. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // A filter whose every reference is a key column — ANY subset of a
    // compound key, so prefix and suffix predicates both qualify —
    // prunes DIRECTORIES at planning time; one the payload dialect can
    // evaluate is pushed into the readers; the rest stay residual.
    val (part, notPart) = filters.partition { f =>
      val refs = f.references
      refs.nonEmpty &&
        refs.forall(r => keyCols.exists(_.equalsIgnoreCase(r))) &&
        CsvFilterEval.supportedBy(keySchema, f)
    }
    val (pay, rest) = notPart.partition(CsvFilterEval.supportedBy(payload, _))
    partFilters = part
    payloadFilters = pay
    rest
  }
  override def pushedFilters(): Array[Filter] = partFilters ++ payloadFilters

  override def build(): Scan = {
    // Planning-time partition pruning: evaluate the key filters against
    // each leaf's typed key tuple.
    val survivors = leaves.filter { case (raws, _) =>
      partFilters.forall(CsvFilterEval.eval(_, KeyedCsvScan.keyLookup(
        keyFields, raws)))
    }
    new KeyedCsvScan(path, required, payload, keyFields, survivors,
      partFilters, payloadFilters, conf, vectorized, limit, nullFill,
      zoneSkip, manifestFiles, maxVersionsPerTrigger)
  }
}

private[sources] object KeyedCsvScan {
  /** Case-insensitive column→typed-value lookup over one leaf's key
    * tuple (filter evaluation during pruning, DELETE, overwrite). */
  def keyLookup(keyFields: Seq[StructField], raws: Seq[String]): String => Any = {
    val m = keyFields.zip(raws).map { case (f, raw) =>
      f.name.toLowerCase(java.util.Locale.ROOT) ->
        PartitionedCsvLayout.keyValue(raw, f.dataType)
    }.toMap
    name => m(name.toLowerCase(java.util.Locale.ROOT))
  }
}

// Public so PlanHygieneSpec can read pushed filters + partition counts
// off the physical plan.
class KeyedCsvScan private[sources] (path: String, required: StructType,
                                     payload: StructType,
                                     keyFields: Seq[StructField],
                                     leaves: Array[(Seq[String], String)],
                                     val partFilters: Array[Filter],
                                     val payloadFilters: Array[Filter],
                                     conf: SerializableHadoopConf,
                                     vectorized: Boolean = false,
                                     val pushedLimit: Option[Int] = None,
                                     nullFill: Boolean = false,
                                     zoneSkip: Boolean = true,
                                     manifestFiles: Option[Map[String, Array[(String, Long)]]] = None,
                                     maxVersionsPerTrigger: Option[Int] = None,
                                     derivedSpec: Option[CsvDerivedSpec] = None)
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportOrdering
    with SupportsRuntimeFiltering with SupportsReportStatistics {

  private val keySchema = StructType(keyFields)

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftCsvKeyed path=$path keys=${keyFields.map(_.name).mkString(",")} " +
      s"partitions=${leaves.length} " +
      s"PartitionFilters: [${partFilters.mkString(", ")}] " +
      s"PushedFilters: [${payloadFilters.mkString(", ")}] " +
      s"ReadSchema: ${required.simpleString}" +
      pushedLimit.map(n => s" PushedLimit: $n").getOrElse("")

  override def toBatch: Batch = this

  /** Runtime (DPP-style) partition pruning: a join against the
    * partitioned table hands the build side's key sets to the scan at
    * execution time — per key COLUMN, so a compound-key table prunes on
    * whichever keys the join touches. Pruned leaves are dropped at the
    * METADATA level — never listed for files, never opened. To keep the
    * reported KeyGroupedPartitioning truthful the partition COUNT is
    * preserved: pruned leaves plan as empty partitions (zero files,
    * zero I/O). */
  @volatile private[sources] var runtimeKeys: Option[Map[Int, Set[Any]]] = None
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    derivedSpec match {
      // bucket mode: runtime values arrive on the SOURCE column and
      // map to bucket ids (hash pruning, the DPP of hidden partitioning)
      case Some(spec) => Array(Expressions.column(spec.col.name))
      case None => keyFields.map(f =>
        Expressions.column(f.name): org.apache.spark.sql.connector.expressions.NamedReference).toArray
    }
  override def filter(filters: Array[Filter]): Unit = derivedSpec match {
    case Some(spec) =>
      spec.runtimeDirs(filters).foreach(dirs =>
        runtimeKeys = Some(Map(0 -> dirs)))
    case None =>
      val perCol = filters.collect {
        case org.apache.spark.sql.sources.In(a, vs)
          if keyFields.exists(_.name.equalsIgnoreCase(a)) =>
          keyFields.indexWhere(_.name.equalsIgnoreCase(a)) -> vs.toSet
        case org.apache.spark.sql.sources.EqualTo(a, v)
          if keyFields.exists(_.name.equalsIgnoreCase(a)) =>
          keyFields.indexWhere(_.name.equalsIgnoreCase(a)) -> Set(v)
      }
      if (perCol.nonEmpty)
        runtimeKeys = Some(perCol.groupBy(_._1).map { case (i, ss) =>
          i -> ss.map(_._2).reduce(_ intersect _)
        })
  }

  /** Per-directory file listings (with sizes), performed AT MOST once
    * per directory and only for directories a plan actually reads
    * (runtime-pruned keys never pay their listing). A version manifest,
    * when one governs this read, IS the listing — versioned scans never
    * touch the filesystem for metadata. */
  private val fileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(String, Long)]]()
  private def listedOf(dir: String): Array[(String, Long)] =
    manifestFiles match {
      case Some(m) => m.getOrElse(dir, Array.empty)
      case None => fileCache.computeIfAbsent(dir,
        d => GraftCsvTable.listPartFilesWithSize(d, conf.value))
    }

  /** Files the zone maps excluded at the last planning (spec surface). */
  @volatile private var skippedByZones: Int = 0
  def zoneSkipped: Int = skippedByZones

  /** Zone maps for this table, loaded at most once per scan and only
    * when a payload filter could use them (key filters already pruned
    * whole directories; zones prune FILES inside surviving ones) — or
    * when statistics want the per-file row counts they carry. */
  private lazy val zones: Map[String, CsvZones.CsvFileZones] =
    CsvZones.load(new HPath(path), conf.value)

  /** Fully-qualified table root (leaf dirs come from listStatus, which
    * qualifies: `file:/…`) — the prefix stripped to recover each file's
    * root-relative publish name, the `_zones` entry key. */
  private lazy val qualifiedRoot: String = {
    val r = new HPath(path)
    r.getFileSystem(conf.value).makeQualified(r).toString
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val schemaJson = keySchema.json
    val keep = runtimeKeys
    val useZones = zoneSkip && payloadFilters.nonEmpty
    var skipped = 0
    val parts = leaves.map { case (raws, dir) =>
      val pruned = keep.exists(_.exists { case (i, ks) =>
        !ks.contains(PartitionedCsvLayout.keyValue(raws(i), keyFields(i).dataType))
      })
      val files =
        if (pruned) Array.empty[String]
        else {
          val listed = listedOf(dir).map(_._1)
          if (!useZones || zones.isEmpty) listed
          else {
            // zone entries are keyed by root-relative publish names
            val relDir =
              if (dir.startsWith(qualifiedRoot))
                dir.substring(qualifiedRoot.length).dropWhile(_ == '/')
              else if (dir.startsWith(path))
                dir.substring(path.length).dropWhile(_ == '/')
              else null
            if (relDir == null) listed
            else {
              val kept = listed.filter { f =>
                val rel = s"$relDir/${new HPath(f).getName}"
                zones.get(rel).forall(z =>
                  ZoneEval.mayMatch(payloadFilters, payload, z.cols))
              }
              skipped += listed.length - kept.length
              kept
            }
          }
        }
      KeyedCsvPartition(raws, schemaJson, files): InputPartition
    }
    skippedByZones = skipped
    parts
  }

  /** Post-static-pruning byte size (the honest estimate a join planner
    * should see: a month-sliced read of a decade-deep table reports the
    * month, not the decade). Without this a DSV2 relation defaults to
    * `defaultSizeInBytes` = never broadcastable.
    *
    * Computed with ONE recursive listing of the table root instead of
    * one listStatus RPC per key directory (advice r13 — at high key
    * cardinality the per-directory loop dominates planning), and the
    * walk seeds the per-directory file cache so partitions planned
    * later reuse it instead of re-listing. Runtime-pruned keys still
    * skip the listing when stats were never requested (computed
    * lazily, at most once per scan). */
  private lazy val survivingBytes: Long = manifestFiles match {
    case Some(m) =>
      // versioned: writer-reported bytes straight off the manifest —
      // zero filesystem metadata ops for statistics
      leaves.iterator.flatMap { case (_, d) => m.getOrElse(d, Array.empty) }
        .map(_._2).sum
    case None => survivingBytesListed
  }

  private lazy val survivingBytesListed: Long = {
    val root = new HPath(path)
    val fs = root.getFileSystem(conf.value)
    val byDir = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(String, Long)]]
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val s = it.next()
        val name = s.getPath.getName
        val parent = s.getPath.getParent
        // skip in-flight temp dirs (_tmp_<queryId>) and meta files
        if (name.startsWith("part-") && name.endsWith(".csv") &&
            !parent.getName.startsWith("_"))
          byDir.getOrElseUpdate(parent.toString,
            scala.collection.mutable.ArrayBuffer.empty) += ((s.getPath.toString, s.getLen))
      }
    }
    leaves.foreach { case (_, d) =>
      fileCache.putIfAbsent(d,
        byDir.get(d).map(_.sortBy(_._1).toArray).getOrElse(Array.empty))
    }
    leaves.iterator.map { case (_, d) =>
      byDir.get(d).map(_.iterator.map(_._2).sum).getOrElse(0L)
    }.sum
  }

  /** Exact post-static-pruning ROW COUNT, when every surviving file's
    * sidecar carries one (tagged writes record it at commit — r15):
    * summed from `_zones` metadata, zero file opens. Any file without
    * the statistic (pre-r15 sidecars, untagged writes) degrades the
    * whole answer to "unknown" — a partial sum would be a LIE the
    * planner acts on. Versioned reads resolve rels off the manifest;
    * listed reads reuse the same per-directory listings planning uses. */
  private lazy val survivingRows: Option[Long] = {
    if (zones.isEmpty) None
    else {
      var sum = 0L
      var all = true
      leaves.foreach { case (_, dir) =>
        val relDir =
          if (dir.startsWith(qualifiedRoot))
            dir.substring(qualifiedRoot.length).dropWhile(_ == '/')
          else if (dir.startsWith(path))
            dir.substring(path.length).dropWhile(_ == '/')
          else null
        if (relDir == null) all = false
        else listedOf(dir).foreach { case (f, _) =>
          if (all) zones.get(s"$relDir/${new HPath(f).getName}")
            .flatMap(_.rows) match {
            case Some(r) => sum += r
            case None => all = false
          }
        }
      }
      if (all) Some(sum) else None
    }
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(survivingBytes)
    override def numRows(): java.util.OptionalLong =
      survivingRows.fold(java.util.OptionalLong.empty())(
        java.util.OptionalLong.of)
  }

  /** The SPJ contract: rows are grouped by `identity(k1), identity(k2),
    * …` with exactly one partition per key tuple. */
  override def outputPartitioning(): Partitioning = derivedSpec match {
    // derived mode: the reported transform is bucket(n, col) /
    // truncate(w, col) — resolved through the catalog's own V2
    // function, so two tables partitioned the same way
    // storage-partition-join with zero exchange
    case Some(spec) =>
      new KeyGroupedPartitioning(Array(spec.transform), leaves.length)
    case None =>
      new KeyGroupedPartitioning(
        keyFields.map(f => Expressions.identity(f.name): Transform).toArray,
        leaves.length)
  }

  /** Within a partition every row carries the SAME key tuple, so
    * "ordered by (k1, k2, …) ascending" holds vacuously — reporting it
    * lets the engine drop the sorts under a storage-partitioned
    * sort-merge join. A BUCKET partition holds many key values in file
    * order: no ordering to report. */
  override def outputOrdering(): Array[SortOrder] =
    if (derivedSpec.isDefined) Array.empty
    else keyFields.map(f => Expressions.sort(Expressions.column(f.name),
      SortDirection.ASCENDING)).toArray

  /** Streaming face (versioned tables only): the commit log as a
    * micro-batch source — see [[GraftLogMicroBatchStream]]. Readers,
    * pushdown, and key pruning are the batch scan's own. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (manifestFiles.isEmpty) throw new UnsupportedOperationException(
      "graft-csv: streaming reads require a VERSIONED catalog table " +
        "(TBLPROPERTIES('versioned'='true') — the commit log is the stream)")
    val schemaJson = keySchema.json
    new GraftLogMicroBatchStream(path, keyFields, partFilters, conf,
      createReaderFactory(),
      (raws, file) => KeyedCsvPartition(raws, schemaJson, Array(file)),
      maxVersionsPerTrigger)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // A DATA column named _file hides the metadata column and parses
    // from the payload like any other field (SupportsMetadataColumns
    // contract; advice r13).
    val fileIsData =
      payload.fieldNames.exists(_.equalsIgnoreCase(GraftCsvTable.FileColumn))
    // Slot per required column: key index (>= 0), PAYLOAD, or FILE —
    // keys and _file are served by the reader wrapper, never parsed.
    val slotOf: Array[Int] = required.fields.map { f =>
      val k = keyFields.indexWhere(_.name.equalsIgnoreCase(f.name))
      if (k >= 0) k
      else if (!fileIsData &&
        f.name.equalsIgnoreCase(GraftCsvTable.FileColumn)) KeyedCsvSlots.File
      else KeyedCsvSlots.Payload
    }
    val payloadRequired = StructType(
      required.fields.zip(slotOf).collect {
        case (f, KeyedCsvSlots.Payload) => f
      })
    // Parse schema: required payload columns plus any payload-filtered
    // columns pruning removed (same discipline as the flat scan).
    val extra = CsvFilterEval.referenced(payloadFilters)
      .filterNot(n => payloadRequired.fieldNames.exists(_.equalsIgnoreCase(n)))
      .flatMap(n => payload.fields.find(_.name.equalsIgnoreCase(n)))
    new KeyedCsvReaderFactory(required, payloadRequired,
      StructType(payloadRequired.fields ++ extra), payloadFilters,
      slotOf, conf, vectorized, pushedLimit, nullFill)
  }
}

private[sources] object KeyedCsvSlots {
  /** slotOf markers: non-negative = key index. */
  val Payload: Int = -1
  val File: Int = -2
}

private[sources] class KeyedCsvReaderFactory(required: StructType,
                                             payloadRequired: StructType,
                                             parse: StructType,
                                             payloadFilters: Array[Filter],
                                             slotOf: Array[Int],
                                             conf: SerializableHadoopConf,
                                             vectorized: Boolean = false,
                                             limit: Option[Int] = None,
                                             nullFill: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KeyedCsvReader(p.asInstanceOf[KeyedCsvPartition], required,
      payloadRequired, parse, payloadFilters, slotOf, conf, limit, nullFill)

  override def supportColumnarReads(p: InputPartition): Boolean = vectorized
  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new KeyedCsvColumnarReader(p.asInstanceOf[KeyedCsvPartition], required,
      payloadRequired, parse, payloadFilters, slotOf, conf,
      limit = limit, nullFill = nullFill)
}

/** Columnar face of the keyed read: payload columns fill on-heap
  * vectors ([[CsvValueIterator]] shared with the row face), while the
  * partition keys — constant across the whole partition by construction
  * — are [[ConstantColumnVector]]s set ONCE per partition: the keys
  * cost zero bytes per row in the batch, the exact vector form of
  * "the key is metadata, not data". */
private[sources] class KeyedCsvColumnarReader(part: KeyedCsvPartition,
                                              required: StructType,
                                              payloadRequired: StructType,
                                              parse: StructType,
                                              payloadFilters: Array[Filter],
                                              slotOf: Array[Int],
                                              conf: SerializableHadoopConf,
                                              batchSize: Int = 4096,
                                              limit: Option[Int] = None,
                                              nullFill: Boolean = false)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector}
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val hasFileCol = slotOf.contains(KeyedCsvSlots.File)
  private val payloadVectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, payloadRequired)
  // _file as a per-BATCH constant vector — batches never span files
  // when the column is requested (see next()), so the constant is
  // re-set at each file roll instead of written per row.
  private val fileVector: ConstantColumnVector =
    if (!hasFileCol) null else new ConstantColumnVector(batchSize, StringType)
  private val columns: Array[ColumnVector] = {
    val keySchema = part.keySchema
    val out = new Array[ColumnVector](required.length)
    var i = 0; var j = 0
    while (i < required.length) {
      slotOf(i) match {
        case KeyedCsvSlots.File => out(i) = fileVector
        case KeyedCsvSlots.Payload => out(i) = payloadVectors(j); j += 1
        case k =>
          val keyType = keySchema(k).dataType
          val kv = new ConstantColumnVector(batchSize, keyType)
          PartitionedCsvLayout.keyValue(part.keyRaws(k), keyType) match {
            case s: String => kv.setUtf8String(UTF8String.fromString(s))
            case l: Long => kv.setLong(l)
            case n: Int => kv.setInt(n)
            case n: Short => kv.setShort(n)
            case b: Boolean => kv.setBoolean(b)
            case other => throw new IllegalStateException(s"key value $other")
          }
          out(i) = kv
      }
      i += 1
    }
    out
  }
  private val batch = new ColumnarBatch(columns)
  private val types: Array[DataType] = payloadRequired.fields.map(_.dataType)

  private var fileIdx = 0
  private var it: CsvValueIterator = _

  private def nextFile(): Boolean = {
    if (it != null) { it.close(); it = null }
    if (fileIdx >= part.files.length) false
    else {
      it = new CsvValueIterator(part.files(fileIdx), payloadRequired, parse,
        payloadFilters, conf, nullFill)
      if (fileVector != null)
        fileVector.setUtf8String(UTF8String.fromString(part.files(fileIdx)))
      fileIdx += 1
      true
    }
  }

  private var emitted = 0L

  override def next(): Boolean = {
    var i = 0
    while (i < payloadVectors.length) { payloadVectors(i).reset(); i += 1 }
    // partial-limit: the batch fill cap shrinks to the rows remaining
    val cap = limit.map(l => math.min(batchSize.toLong, l - emitted).toInt)
      .getOrElse(batchSize)
    if (cap <= 0) return false
    var n = 0
    while (n < cap) {
      if (it == null) {
        // end the batch at a file boundary when _file is requested —
        // the constant vector must hold ONE value per batch
        if (hasFileCol && n > 0) { emitted += n; batch.setNumRows(n); return true }
        if (!nextFile()) {
          if (n == 0) return false
          emitted += n; batch.setNumRows(n); return true
        }
      }
      if (it.next()) {
        var j = 0
        while (j < types.length) {
          val v = it.values(j)
          if (v == null) payloadVectors(j).putNull(n)
          else types(j) match {
            case StringType =>
              val b = v.asInstanceOf[String]
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              payloadVectors(j).putByteArray(n, b, 0, b.length)
            case LongType => payloadVectors(j).putLong(n, v.asInstanceOf[Long])
            case IntegerType => payloadVectors(j).putInt(n, v.asInstanceOf[Int])
            case ShortType => payloadVectors(j).putShort(n, v.asInstanceOf[Short])
            case DoubleType => payloadVectors(j).putDouble(n, v.asInstanceOf[Double])
            case FloatType => payloadVectors(j).putFloat(n, v.asInstanceOf[Float])
            case BooleanType => payloadVectors(j).putBoolean(n, v.asInstanceOf[Boolean])
            case other => throw new UnsupportedOperationException(
              s"graft-csv columnar read: unsupported column type $other")
          }
          j += 1
        }
        n += 1
      } else { it.close(); it = null }
    }
    emitted += n
    batch.setNumRows(n)
    true
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = { batch.close(); if (it != null) it.close() }
}

/** Streams every part file of one leaf directory through the flat CSV
  * reader, re-inserting the (constant) partition keys into their
  * projected positions. The keys never exist in the payload bytes —
  * they cost one catalyst value per PARTITION, not per row. */
private[sources] class KeyedCsvReader(part: KeyedCsvPartition,
                                      required: StructType,
                                      payloadRequired: StructType,
                                      parse: StructType,
                                      payloadFilters: Array[Filter],
                                      slotOf: Array[Int],
                                      conf: SerializableHadoopConf,
                                      limit: Option[Int] = None,
                                      nullFill: Boolean = false)
    extends PartitionReader[InternalRow] {
  private val keyValues: Array[Any] = {
    val ks = part.keySchema
    ks.fields.zip(part.keyRaws).map { case (f, raw) =>
      PartitionedCsvLayout.catalystKey(raw, f.dataType)
    }.toArray[Any]
  }
  private val passthrough = slotOf.forall(_ == KeyedCsvSlots.Payload)
  private var fileIdx = 0
  private var emitted = 0L
  private var inner: GraftCsvPartitionReader = _
  private var currentFile: UTF8String = _
  private var row: InternalRow = _

  private def nextInner(): Boolean = {
    if (inner != null) { inner.close(); inner = null }
    if (fileIdx >= part.files.length) false
    else {
      inner = new GraftCsvPartitionReader(part.files(fileIdx), payloadRequired,
        payloadRequired, parse, payloadFilters, conf, None, -1, nullFill)
      currentFile = UTF8String.fromString(part.files(fileIdx))
      fileIdx += 1
      true
    }
  }

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    while (true) {
      if (inner == null && !nextInner()) return false
      if (inner.next()) {
        val payloadRow = inner.get()
        row =
          if (passthrough) payloadRow
          else {
            val out = new Array[Any](required.length)
            var i = 0; var j = 0
            while (i < required.length) {
              slotOf(i) match {
                case KeyedCsvSlots.File => out(i) = currentFile
                case KeyedCsvSlots.Payload =>
                  out(i) = payloadRow.get(j, payloadRequired(j).dataType); j += 1
                case k => out(i) = keyValues(k)
              }
              i += 1
            }
            new GenericInternalRow(out)
          }
        emitted += 1
        return true
      }
      inner.close(); inner = null
    }
    false // unreachable
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (inner != null) inner.close()
}

/** Commit message for a task that published SEVERAL files (one per key
  * tuple in its sorted run). */
private[sources] case class CsvFilesCommit(files: Seq[CsvFileCommit])
  extends WriterCommitMessage

/** The partitioned writer: the engine has already clustered AND sorted
  * this task's rows by the keys (RequiresDistributionAndOrdering), so
  * key tuples arrive as contiguous runs — each run streams to one temp
  * file destined for `<c1>=<v1>/…/<cN>=<vN>/part-<partition>.csv`.
  * Because a key tuple lives in exactly one cluster partition, each
  * leaf directory receives exactly one file per write. */
private[sources] class GraftCsvPartitionedWriter(tmpDir: String,
                                                 schema: StructType,
                                                 partCols: Seq[String],
                                                 partitionId: Int, taskId: Long,
                                                 conf: SerializableHadoopConf,
                                                 stem: String = "part",
                                                 trackZones: Boolean = false)
    extends DataWriter[InternalRow] {
  private val keyIdx: Array[Int] = partCols.map(c =>
    schema.fieldNames.indexWhere(_.equalsIgnoreCase(c))).toArray
  private val keyTypes: Array[DataType] = keyIdx.map(schema(_).dataType)
  private val payloadIdx: Array[Int] =
    schema.fields.indices.filterNot(keyIdx.contains).toArray
  private val payload = StructType(payloadIdx.map(schema(_)))

  private var currentKey: String = _ // encoded rel dir; null = no file open
  private var current: GraftCsvDataWriter = _
  private val committed = scala.collection.mutable.ArrayBuffer.empty[CsvFileCommit]
  // metrics carried across rolled files (the current file's live
  // counters are added in currentMetricsValues)
  private var rolledRows = 0L
  private var rolledBytes = 0L

  private def keyString(row: InternalRow, k: Int): String = {
    val i = keyIdx(k)
    if (row.isNullAt(i)) throw new IllegalArgumentException(
      s"graft-csv sink: NULL value in partition column '${partCols(k)}' — " +
        "partition keys must be non-null")
    keyTypes(k) match {
      case StringType => row.getUTF8String(i).toString
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case BooleanType => row.getBoolean(i).toString
      case other => throw new UnsupportedOperationException(
        s"graft-csv sink: unsupported partition key type $other")
    }
  }

  /** Nested relative directory for this row's key tuple. */
  private def keyDir(row: InternalRow): String =
    partCols.indices.map(k =>
      s"${partCols(k)}=${PartitionedCsvLayout.encode(keyString(row, k))}")
      .mkString("/")

  private def roll(dir: String): Unit = {
    if (current != null) {
      rolledRows += current.rows
      rolledBytes += current.bytes
      committed += current.commit().asInstanceOf[CsvFileCommit]
    }
    current = new GraftCsvDataWriter(tmpDir, payload, partitionId, taskId, conf,
      f"$dir/$stem-$partitionId%05d.csv", trackZones)
    currentKey = dir
  }

  override def write(row: InternalRow): Unit = {
    val dir = keyDir(row)
    if (currentKey == null || currentKey != dir) roll(dir)
    // project the payload columns into the inner writer's schema order
    val out = new Array[Any](payloadIdx.length)
    var i = 0
    while (i < payloadIdx.length) {
      out(i) = if (row.isNullAt(payloadIdx(i))) null
        else payload(i).dataType match {
          case StringType => row.getUTF8String(payloadIdx(i))
          case LongType => row.getLong(payloadIdx(i))
          case IntegerType => row.getInt(payloadIdx(i))
          case ShortType => row.getShort(payloadIdx(i))
          case DoubleType => row.getDouble(payloadIdx(i))
          case FloatType => row.getFloat(payloadIdx(i))
          case BooleanType => row.getBoolean(payloadIdx(i))
          case other => throw new UnsupportedOperationException(
            s"graft-csv sink: unsupported column type $other")
        }
      i += 1
    }
    current.write(new GenericInternalRow(out))
  }

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val liveRows = if (current != null) current.rows else 0L
    val liveBytes = if (current != null) current.bytes else 0L
    Array(PagedTaskMetric("csvRowsWritten", rolledRows + liveRows),
      PagedTaskMetric("csvBytesWritten", rolledBytes + liveBytes),
      PagedTaskMetric("csvFilesWritten",
        committed.length + (if (current != null) 1L else 0L)))
  }

  override def commit(): WriterCommitMessage = {
    if (current != null) {
      rolledRows += current.rows
      rolledBytes += current.bytes
      committed += current.commit().asInstanceOf[CsvFileCommit]
      current = null
    }
    CsvFilesCommit(committed.toSeq)
  }

  override def abort(): Unit = if (current != null) current.abort()

  override def close(): Unit = ()
}
