package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash-bucket partitioning for catalog tables (r15):
  * `PARTITIONED BY (bucket(8, k))` — the Iceberg hidden-partitioning
  * shape, solving the problem identity keys cannot: at 100 TB a
  * HIGH-CARDINALITY key (customer id, document id) cannot become one
  * directory per value (a million directories is a namenode DoS and a
  * one-row-per-file layout), but it can become `n` stable hash
  * buckets. What that buys, end to end:
  *
  *  - **Writes cluster by bucket.** Every INSERT demands a clustered
  *    distribution on `bucket(n, k)` (resolved through the catalog's
  *    own V2 `bucket` function), so each task's rows arrive grouped
  *    and the writer rolls one file per bucket — `n` files per write,
  *    regardless of key cardinality.
  *  - **Equality prunes to one bucket.** `WHERE k = v` computes
  *    `bucket(v)` at planning time and opens a single `k_bucket=i/`
  *    directory — and runtime (DPP-shaped) IN-filters from a join's
  *    build side prune the same way.
  *  - **Joins need no exchange.** The scan reports
  *    `KeyGroupedPartitioning(bucket(n, k))`; two tables bucketed the
  *    same way join storage-partitioned — zero shuffle of either side
  *    (`spark.sql.sources.v2.bucketing.enabled=true`).
  *
  * The bucket id is METADATA, not data: the column stays in the
  * payload (unlike identity keys, which the layout strips), so the
  * file format is unchanged and zone maps still skip within a bucket.
  *
  * The hash is part of the LAYOUT CONTRACT: changing it orphans every
  * committed directory, so it is fixed here, documented, and
  * deliberately simple — splitmix64 for integral/boolean keys, FNV-1a
  * 64 over UTF-8 bytes for strings, id = floorMod(hash, n). NULL
  * bucket keys are refused at write time (same rule as identity
  * partition keys).
  */
private[sources] case class CsvBucketSpec(col: StructField, n: Int) {
  require(n > 0, s"bucket count must be positive; got $n")
  /** The synthetic (hidden) key field backing partition grouping —
    * never part of the table schema. */
  def syntheticField: StructField =
    StructField(s"${col.name}_bucket", IntegerType, nullable = false)
  def dirName(id: Int): String = s"${col.name}_bucket=$id"
  def dirPrefix: String = s"${col.name}_bucket="
  def idOf(v: Any): Int = CsvBuckets.id(n, v)
}

private[sources] object CsvBuckets {
  /** splitmix64 finalizer — avalanches integral keys. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over bytes — strings hash by UTF-8 content, so the
    * JVM-String and UTF8String faces agree by construction. */
  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def hash(v: Any): Long = v match {
    case s: UTF8String => fnv64(s.getBytes)
    case s: String => fnv64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case l: Long => mix64(l)
    case i: Int => mix64(i.toLong)
    case s: Short => mix64(s.toLong)
    case b: Boolean => mix64(if (b) 1L else 0L)
    case null => throw new IllegalArgumentException(
      "graft-csv: NULL value in a bucket key column — bucket keys must " +
        "be non-null (same rule as identity partition keys)")
    case other => throw new UnsupportedOperationException(
      s"graft-csv: unsupported bucket key value $other (${other.getClass})")
  }

  def id(n: Int, v: Any): Int = java.lang.Math.floorMod(hash(v), n.toLong).toInt

  /** Planning-time bucket pruning: the ids that could satisfy the
    * pushed filters — only NARROWING shapes (equality / IN on the
    * bucket column, non-null literals) restrict; anything else keeps
    * every bucket (hash layouts cannot serve ranges). Conjunction
    * intersects. `None` = no restriction. */
  def pruneIds(filters: Array[Filter], spec: CsvBucketSpec): Option[Set[Int]] = {
    val sets = filters.collect {
      case EqualTo(a, v) if a.equalsIgnoreCase(spec.col.name) && v != null =>
        Set(spec.idOf(v))
      case EqualNullSafe(a, v) if a.equalsIgnoreCase(spec.col.name) && v != null =>
        Set(spec.idOf(v))
      case In(a, vs) if a.equalsIgnoreCase(spec.col.name) =>
        vs.iterator.filter(_ != null).map(spec.idOf).toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }
}

/** Scan builder for bucketed catalog tables. Every pushed filter is a
  * PAYLOAD filter (the bucket column is ordinary data in the file);
  * narrowing filters on the bucket column ADDITIONALLY prune bucket
  * directories at build time. Produces the shared [[KeyedCsvScan]] in
  * bucket mode: the synthetic `<col>_bucket` int is the partition key,
  * the reported partitioning is the `bucket(n, col)` transform. */
private[sources] class BucketedCsvScanBuilder(path: String, full: StructType,
                                              spec: CsvBucketSpec,
                                              leaves: Array[(Int, String)],
                                              conf: SerializableHadoopConf,
                                              vectorized: Boolean,
                                              nullFill: Boolean,
                                              zoneSkip: Boolean = true,
                                              manifestFiles: Option[Map[String, Array[(String, Long)]]] = None,
                                              maxVersionsPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var required: StructType = full
  private var payloadFilters: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pay, rest) = filters.partition(CsvFilterEval.supportedBy(full, _))
    payloadFilters = pay
    rest
  }
  override def pushedFilters(): Array[Filter] = payloadFilters

  override def build(): Scan = {
    val ids = CsvBuckets.pruneIds(payloadFilters, spec)
    val survivors = leaves.filter { case (id, _) => ids.forall(_.contains(id)) }
    new KeyedCsvScan(path, required, payload = full,
      keyFields = Seq(spec.syntheticField),
      leaves = survivors.map { case (id, dir) => (Seq(id.toString), dir) },
      partFilters = Array.empty, payloadFilters, conf, vectorized, limit,
      nullFill, zoneSkip, manifestFiles, maxVersionsPerTrigger,
      bucketSpec = Some(spec))
  }
}

/** The bucketed writer: same rolling shape as the identity-key
  * partitioned writer (input arrives clustered and sorted by
  * `bucket(n, col)` per the write's required distribution, so one
  * sequential pass rolls one file per bucket), but the payload is the
  * FULL schema — the bucket id is a directory name, not a stripped
  * column. */
private[sources] class BucketedCsvWriter(tmpDir: String, schema: StructType,
                                         spec: CsvBucketSpec,
                                         partitionId: Int, taskId: Long,
                                         conf: SerializableHadoopConf,
                                         stem: String,
                                         trackZones: Boolean)
    extends org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.write.WriterCommitMessage

  private val colIdx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(spec.col.name))
  require(colIdx >= 0, s"bucket column '${spec.col.name}' missing from write schema")
  private val colType = schema(colIdx).dataType

  private var currentId: Int = -1
  private var current: GraftCsvDataWriter = _
  private val committed = scala.collection.mutable.ArrayBuffer.empty[CsvFileCommit]
  private var rolledRows = 0L
  private var rolledBytes = 0L

  private def bucketOf(row: InternalRow): Int = {
    if (row.isNullAt(colIdx)) throw new IllegalArgumentException(
      s"graft-csv: NULL value in bucket key column '${spec.col.name}' — " +
        "bucket keys must be non-null (same rule as identity partition keys)")
    spec.idOf(colType match {
      case StringType => row.getUTF8String(colIdx)
      case LongType => row.getLong(colIdx)
      case IntegerType => row.getInt(colIdx)
      case ShortType => row.getShort(colIdx)
      case BooleanType => row.getBoolean(colIdx)
      case other => throw new UnsupportedOperationException(
        s"graft-csv sink: unsupported bucket key type $other")
    })
  }

  private def roll(id: Int): Unit = {
    if (current != null) {
      rolledRows += current.rows
      rolledBytes += current.bytes
      committed += current.commit().asInstanceOf[CsvFileCommit]
    }
    current = new GraftCsvDataWriter(tmpDir, schema, partitionId, taskId, conf,
      f"${spec.dirName(id)}/$stem-$partitionId%05d.csv", trackZones)
    currentId = id
  }

  override def write(row: InternalRow): Unit = {
    val id = bucketOf(row)
    if (current == null || currentId != id) roll(id)
    current.write(row)
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
