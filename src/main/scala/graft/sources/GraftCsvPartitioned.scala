package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
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
  * WRITE (`option("partitionedBy", "m")`): the sink REQUIRES clustering
  * + in-partition ordering on the key (RequiresDistributionAndOrdering,
  * same contract as `clusterBy`), then each task splits its sorted run
  * into one file per key under `m=<value>/part-NNNNN.csv`. The key
  * column is carried by the DIRECTORY NAME, not the payload (hive
  * convention) — a 100 TB table partitioned on a grain key never
  * stores the key bytes per row.
  *
  * READ: the scan plans ONE input partition per key directory, each
  * declaring its key ([[HasPartitionKey]]), and reports
  * [[KeyGroupedPartitioning]] over `identity(key)` plus a per-partition
  * ordering on the key ([[SupportsReportOrdering]] — trivially true:
  * every row in a partition shares the key). With
  * `spark.sql.sources.v2.bucketing.enabled` the engine then plans
  * joins between two such tables on the key with ZERO Exchange and
  * ZERO Sort — the storage-partitioned join. At 100 TB this is the
  * bucketed-join economics without a Hive metastore: pay the
  * clustering shuffle once at write time, and every downstream join or
  * aggregation on the grain key is exchange-free forever.
  *
  * Planning-time partition pruning: pushed filters that mention ONLY
  * the key column are evaluated against the directory names — pruned
  * key directories are never listed for files, let alone read (the
  * engine form of hive partition pruning). Payload filters ride the
  * existing in-reader pushdown.
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
}

/** One key directory = one input partition, declaring its partition key
  * so the engine can group and align partitions across the two sides of
  * a storage-partitioned join. */
private[sources] case class KeyedCsvPartition(keyRaw: String,
                                              keyTypeJson: String,
                                              files: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](PartitionedCsvLayout.catalystKey(
      keyRaw, DataType.fromJson(keyTypeJson))))
}

private[sources] class KeyedCsvScanBuilder(path: String, full: StructType,
                                           keyCol: String,
                                           dirs: Array[(String, String, String)],
                                           conf: SerializableHadoopConf,
                                           vectorized: Boolean = false,
                                           nullFill: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private val keyField: StructField = full.fields
    .find(_.name.equalsIgnoreCase(keyCol))
    .getOrElse(throw new IllegalArgumentException(
      s"graft-csv partitioned read: schema lacks partition column '$keyCol' " +
        s"(layout at $path); pass a schema containing it"))
  /** The payload face: everything the part files actually store. */
  private val payload = StructType(full.fields.filterNot(
    _.name.equalsIgnoreCase(keyCol)))

  private var required: StructType = full
  private var partFilters: Array[Filter] = Array.empty
  private var payloadFilters: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** PARTIAL limit per key-directory partition (same contract as the
    * flat scan); the engine's CollectLimit finishes globally. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // A filter whose every reference is the key column prunes DIRECTORIES
    // at planning time; one the payload dialect can evaluate is pushed
    // into the readers; the rest stay residual for Spark.
    val (part, notPart) = filters.partition { f =>
      val refs = f.references
      refs.nonEmpty && refs.forall(_.equalsIgnoreCase(keyCol)) &&
        CsvFilterEval.supportedBy(full, f)
    }
    val (pay, rest) = notPart.partition(CsvFilterEval.supportedBy(payload, _))
    partFilters = part
    payloadFilters = pay
    rest
  }
  override def pushedFilters(): Array[Filter] = partFilters ++ payloadFilters

  override def build(): Scan = {
    // Planning-time partition pruning: evaluate the key filters against
    // each directory's typed key value.
    val survivors = dirs.filter { case (_, raw, _) =>
      val v = PartitionedCsvLayout.keyValue(raw, keyField.dataType)
      partFilters.forall(CsvFilterEval.eval(_, _ => v))
    }
    new KeyedCsvScan(path, required, payload, keyField, survivors,
      partFilters, payloadFilters, conf, vectorized, limit, nullFill)
  }
}

// Public so PlanHygieneSpec can read pushed filters + partition counts
// off the physical plan.
class KeyedCsvScan private[sources] (path: String, required: StructType,
                                     payload: StructType,
                                     keyField: StructField,
                                     dirs: Array[(String, String, String)],
                                     val partFilters: Array[Filter],
                                     val payloadFilters: Array[Filter],
                                     conf: SerializableHadoopConf,
                                     vectorized: Boolean = false,
                                     val pushedLimit: Option[Int] = None,
                                     nullFill: Boolean = false)
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportOrdering
    with SupportsRuntimeFiltering with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftCsvKeyed path=$path key=${keyField.name} partitions=${dirs.length} " +
      s"PartitionFilters: [${partFilters.mkString(", ")}] " +
      s"PushedFilters: [${payloadFilters.mkString(", ")}] " +
      s"ReadSchema: ${required.simpleString}" +
      pushedLimit.map(n => s" PushedLimit: $n").getOrElse("")

  override def toBatch: Batch = this

  /** Runtime (DPP-style) partition pruning: a join against the
    * partitioned table hands the build side's key set to the scan at
    * execution time; directories whose key is not in the set are
    * dropped at the METADATA level — never listed for files, never
    * opened. To keep the reported KeyGroupedPartitioning truthful the
    * partition COUNT is preserved: pruned keys plan as empty
    * partitions (zero files, zero I/O). */
  @volatile private[sources] var runtimeKeys: Option[Set[Any]] = None
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column(keyField.name))
  override def filter(filters: Array[Filter]): Unit = {
    val sets = filters.collect {
      case org.apache.spark.sql.sources.In(a, vs)
        if a.equalsIgnoreCase(keyField.name) => vs.toSet
      case org.apache.spark.sql.sources.EqualTo(a, v)
        if a.equalsIgnoreCase(keyField.name) => Set(v)
    }
    if (sets.nonEmpty) runtimeKeys = Some(sets.reduce(_ intersect _))
  }

  /** Per-directory file listings (with sizes), performed AT MOST once
    * per directory and only for directories a plan actually reads
    * (runtime-pruned keys never pay their listing). */
  private val fileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(String, Long)]]()
  private def listedOf(dir: String): Array[(String, Long)] =
    fileCache.computeIfAbsent(dir,
      d => GraftCsvTable.listPartFilesWithSize(d, conf.value))

  override def planInputPartitions(): Array[InputPartition] = {
    val typeJson = keyField.dataType.json
    val keep = runtimeKeys
    dirs.map { case (_, raw, dir) =>
      val pruned = keep.exists(ks =>
        !ks.contains(PartitionedCsvLayout.keyValue(raw, keyField.dataType)))
      KeyedCsvPartition(raw, typeJson,
        if (pruned) Array.empty else listedOf(dir).map(_._1)): InputPartition
    }
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
  private lazy val survivingBytes: Long = {
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
    dirs.foreach { case (_, _, d) =>
      fileCache.putIfAbsent(d,
        byDir.get(d).map(_.sortBy(_._1).toArray).getOrElse(Array.empty))
    }
    dirs.iterator.map { case (_, _, d) =>
      byDir.get(d).map(_.iterator.map(_._2).sum).getOrElse(0L)
    }.sum
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(survivingBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  /** The SPJ contract: rows are grouped by `identity(key)` with exactly
    * one partition per key value. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity(keyField.name)),
      dirs.length)

  /** Within a partition every row carries the SAME key, so "ordered by
    * key ascending" holds vacuously — reporting it lets the engine drop
    * the sorts under a storage-partitioned sort-merge join. */
  override def outputOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.column(keyField.name),
      SortDirection.ASCENDING))

  override def createReaderFactory(): PartitionReaderFactory = {
    val keyPos = required.fieldNames.indexWhere(
      _.equalsIgnoreCase(keyField.name))
    // A DATA column named _file hides the metadata column and parses
    // from the payload like any other field (SupportsMetadataColumns
    // contract; advice r13).
    val filePos =
      if (payload.fieldNames.exists(_.equalsIgnoreCase(GraftCsvTable.FileColumn))) -1
      else required.fieldNames.indexWhere(
        _.equalsIgnoreCase(GraftCsvTable.FileColumn))
    // Payload = required minus the key and (metadata-served) _file
    // columns (both served by the reader wrapper, never parsed).
    val payloadRequired = StructType(required.fields.zipWithIndex.filterNot {
      case (f, i) => f.name.equalsIgnoreCase(keyField.name) || i == filePos
    }.map(_._1))
    // Parse schema: required payload columns plus any payload-filtered
    // columns pruning removed (same discipline as the flat scan).
    val extra = CsvFilterEval.referenced(payloadFilters)
      .filterNot(n => payloadRequired.fieldNames.exists(_.equalsIgnoreCase(n)))
      .flatMap(n => payload.fields.find(_.name.equalsIgnoreCase(n)))
    new KeyedCsvReaderFactory(required, payloadRequired,
      StructType(payloadRequired.fields ++ extra), payloadFilters,
      keyPos, keyField.dataType.json, conf, vectorized, pushedLimit, filePos,
      nullFill)
  }
}

private[sources] class KeyedCsvReaderFactory(required: StructType,
                                             payloadRequired: StructType,
                                             parse: StructType,
                                             payloadFilters: Array[Filter],
                                             keyPos: Int, keyTypeJson: String,
                                             conf: SerializableHadoopConf,
                                             vectorized: Boolean = false,
                                             limit: Option[Int] = None,
                                             filePos: Int = -1,
                                             nullFill: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new KeyedCsvReader(p.asInstanceOf[KeyedCsvPartition], required,
      payloadRequired, parse, payloadFilters, keyPos, keyTypeJson, conf, limit,
      filePos, nullFill)

  override def supportColumnarReads(p: InputPartition): Boolean = vectorized
  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new KeyedCsvColumnarReader(p.asInstanceOf[KeyedCsvPartition], required,
      payloadRequired, parse, payloadFilters, keyPos, keyTypeJson, conf,
      limit = limit, filePos = filePos, nullFill = nullFill)
}

/** Columnar face of the keyed read: payload columns fill on-heap
  * vectors ([[CsvValueIterator]] shared with the row face), while the
  * partition key — constant across the whole partition by construction
  * — is a [[ConstantColumnVector]] set ONCE per partition: the key
  * costs zero bytes per row in the batch, the exact vector form of
  * "the key is metadata, not data". */
private[sources] class KeyedCsvColumnarReader(part: KeyedCsvPartition,
                                              required: StructType,
                                              payloadRequired: StructType,
                                              parse: StructType,
                                              payloadFilters: Array[Filter],
                                              keyPos: Int, keyTypeJson: String,
                                              conf: SerializableHadoopConf,
                                              batchSize: Int = 4096,
                                              limit: Option[Int] = None,
                                              filePos: Int = -1,
                                              nullFill: Boolean = false)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector}
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val payloadVectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, payloadRequired)
  // _file as a per-BATCH constant vector — batches never span files
  // when the column is requested (see next()), so the constant is
  // re-set at each file roll instead of written per row.
  private val fileVector: ConstantColumnVector =
    if (filePos < 0) null else new ConstantColumnVector(batchSize, StringType)
  private val columns: Array[ColumnVector] = {
    val out = new Array[ColumnVector](required.length)
    var i = 0; var j = 0
    while (i < required.length) {
      if (i == keyPos) {
        val keyType = DataType.fromJson(keyTypeJson)
        val kv = new ConstantColumnVector(batchSize, keyType)
        PartitionedCsvLayout.keyValue(part.keyRaw, keyType) match {
          case s: String => kv.setUtf8String(UTF8String.fromString(s))
          case l: Long => kv.setLong(l)
          case n: Int => kv.setInt(n)
          case n: Short => kv.setShort(n)
          case b: Boolean => kv.setBoolean(b)
          case other => throw new IllegalStateException(s"key value $other")
        }
        out(i) = kv
      } else if (i == filePos) { out(i) = fileVector }
      else { out(i) = payloadVectors(j); j += 1 }
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
        if (filePos >= 0 && n > 0) { emitted += n; batch.setNumRows(n); return true }
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

/** Streams every part file of one key directory through the flat CSV
  * reader, re-inserting the (constant) partition key into its projected
  * position. The key never exists in the payload bytes — it costs one
  * catalyst value per PARTITION, not per row. */
private[sources] class KeyedCsvReader(part: KeyedCsvPartition,
                                      required: StructType,
                                      payloadRequired: StructType,
                                      parse: StructType,
                                      payloadFilters: Array[Filter],
                                      keyPos: Int, keyTypeJson: String,
                                      conf: SerializableHadoopConf,
                                      limit: Option[Int] = None,
                                      filePos: Int = -1,
                                      nullFill: Boolean = false)
    extends PartitionReader[InternalRow] {
  private val keyValue: Any =
    PartitionedCsvLayout.catalystKey(part.keyRaw, DataType.fromJson(keyTypeJson))
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
          if (keyPos < 0 && filePos < 0) payloadRow
          else {
            val out = new Array[Any](required.length)
            var i = 0; var j = 0
            while (i < required.length) {
              if (i == keyPos) out(i) = keyValue
              else if (i == filePos) out(i) = currentFile
              else { out(i) = payloadRow.get(j, payloadRequired(j).dataType); j += 1 }
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
  * in its sorted run). */
private[sources] case class CsvFilesCommit(files: Seq[CsvFileCommit])
  extends WriterCommitMessage

/** The partitioned writer: the engine has already clustered AND sorted
  * this task's rows by the key (RequiresDistributionAndOrdering), so
  * keys arrive as contiguous runs — each run streams to one temp file
  * destined for `<col>=<value>/part-<partition>.csv`. Because a key
  * lives in exactly one cluster partition, each key directory receives
  * exactly one file per write. */
private[sources] class GraftCsvPartitionedWriter(tmpDir: String,
                                                 schema: StructType,
                                                 partCol: String,
                                                 partitionId: Int, taskId: Long,
                                                 conf: SerializableHadoopConf,
                                                 stem: String = "part")
    extends DataWriter[InternalRow] {
  private val keyIdx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(partCol))
  private val keyType = schema(keyIdx).dataType
  private val payload = StructType(
    schema.fields.zipWithIndex.filter(_._2 != keyIdx).map(_._1))
  private val payloadIdx: Array[Int] =
    schema.fields.indices.filter(_ != keyIdx).toArray

  private var currentKey: String = _ // encoded; null = no file open yet
  private var current: GraftCsvDataWriter = _
  private val committed = scala.collection.mutable.ArrayBuffer.empty[CsvFileCommit]
  // metrics carried across rolled files (the current file's live
  // counters are added in currentMetricsValues)
  private var rolledRows = 0L
  private var rolledBytes = 0L

  private def keyString(row: InternalRow): String = {
    if (row.isNullAt(keyIdx)) throw new IllegalArgumentException(
      s"graft-csv sink: NULL value in partition column '$partCol' — " +
        "partition keys must be non-null")
    keyType match {
      case StringType => row.getUTF8String(keyIdx).toString
      case LongType => row.getLong(keyIdx).toString
      case IntegerType => row.getInt(keyIdx).toString
      case ShortType => row.getShort(keyIdx).toString
      case BooleanType => row.getBoolean(keyIdx).toString
      case other => throw new UnsupportedOperationException(
        s"graft-csv sink: unsupported partition key type $other")
    }
  }

  private def roll(keyEnc: String): Unit = {
    if (current != null) {
      rolledRows += current.rows
      rolledBytes += current.bytes
      committed += current.commit().asInstanceOf[CsvFileCommit]
    }
    current = new GraftCsvDataWriter(tmpDir, payload, partitionId, taskId, conf,
      f"$partCol=$keyEnc/$stem-$partitionId%05d.csv")
    currentKey = keyEnc
  }

  override def write(row: InternalRow): Unit = {
    val keyEnc = PartitionedCsvLayout.encode(keyString(row))
    if (currentKey == null || currentKey != keyEnc) roll(keyEnc)
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
