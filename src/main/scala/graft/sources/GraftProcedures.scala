package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL stored procedures on the graft catalog (Spark 4's DSV2
  * `ProcedureCatalog`, SPARK-44167) — the maintenance verbs a warehouse
  * operator runs, callable from pure SQL:
  *
  * {{{
  * CALL graft.history('wh.events')     -- one row per manifest version
  * CALL graft.vacuum('wh.events', 3)   -- retain 3 versions, reclaim the rest
  * }}}
  *
  * Both return LOCAL result scans (driver-side rows): procedure output
  * is metadata about metadata — versions, counts, bytes — never data.
  */
private[sources] object GraftProcedures {
  val Names: Seq[String] = Seq("history", "vacuum", "compact", "rollback")

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "vacuum" => Some(new VacuumProcedure(catalog))
      case "history" => Some(new HistoryProcedure(catalog))
      case "compact" => Some(new CompactProcedure(catalog))
      case "rollback" => Some(new RollbackProcedure(catalog))
      case _ => None
    }

  /** `'ns.table'` (or `'ns.sub.table'`) → catalog Identifier. */
  def identOf(table: String): Identifier = {
    val parts = table.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"graft catalog: expected 'namespace.table', got '$table'")
    Identifier.of(parts.init, parts.last)
  }

  def oneRowScan(schema: StructType, row: Array[Any]): java.util.Iterator[Scan] =
    rowsScan(schema, Array(new GenericInternalRow(row): InternalRow))

  def rowsScan(schema: StructType,
               rs: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = rs
    }).iterator()
}

/** `CALL graft.vacuum(table, retain[, orphan_grace_ms])`: drops
  * manifests past the retention horizon and every byte no retained
  * version references — the SQL face of [[GraftCatalog.vacuumTable]].
  * Files referenced by NO manifest (possible in-flight commits) are
  * only reclaimed when older than the grace window — see vacuumTable's
  * doc for the concurrent-writer race this prices. Returns one row:
  * (manifests_dropped, files_deleted). */
private[sources] class VacuumProcedure(catalog: GraftCatalog)
    extends UnboundProcedure {
  override def name(): String = "vacuum"
  override def description(): String =
    "reclaim a versioned table's space, retaining the newest N versions"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String = VacuumProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("'namespace.table' of a versioned catalog table").build(),
      ProcedureParameter.in("retain", IntegerType)
        .comment("how many newest versions to keep (>= 1)").build(),
      ProcedureParameter.in("orphan_grace_ms", LongType)
        .defaultValue(GraftCatalog.DefaultOrphanGraceMs.toString)
        .comment("min age of a never-committed file before reclamation " +
          "(protects in-flight commits; default 24h)").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ident = GraftProcedures.identOf(input.getUTF8String(0).toString)
      val (manifests, files) =
        catalog.vacuumTable(ident, input.getInt(1), input.getLong(2))
      GraftProcedures.oneRowScan(
        new StructType()
          .add("manifests_dropped", IntegerType, nullable = false)
          .add("files_deleted", IntegerType, nullable = false),
        Array[Any](manifests, files))
    }
  }
}

/** `CALL graft.compact(table)`: merge every multi-file key's accreted
  * files into one, published as a single copy-on-write manifest commit
  * — the SQL face of [[GraftCatalog.compactTable]] and the first
  * maintenance verb a daily-reload operator reaches for. Returns one
  * row: (groups_compacted, files_merged). */
private[sources] class CompactProcedure(catalog: GraftCatalog)
    extends UnboundProcedure {
  override def name(): String = "compact"
  override def description(): String =
    "merge a versioned partitioned table's per-key small files (COW commit)"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "compact"
    override def description(): String = CompactProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("'namespace.table' of a versioned partitioned catalog table")
        .build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ident = GraftProcedures.identOf(input.getUTF8String(0).toString)
      val (groups, files) = catalog.compactTable(ident)
      GraftProcedures.oneRowScan(
        new StructType()
          .add("groups_compacted", IntegerType, nullable = false)
          .add("files_merged", IntegerType, nullable = false),
        Array[Any](groups, files))
    }
  }
}

/** `CALL graft.rollback(table, version)`: restore a versioned table to
  * an earlier version as a NEW commit (one manifest write, zero data
  * copies) — the undo verb for a bad load; the SQL face of
  * [[GraftCatalog.rollbackTable]]. Returns one row:
  * (restored_version, new_version). */
private[sources] class RollbackProcedure(catalog: GraftCatalog)
    extends UnboundProcedure {
  override def name(): String = "rollback"
  override def description(): String =
    "restore a versioned table to an earlier version (as a new commit)"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "rollback"
    override def description(): String = RollbackProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("'namespace.table' of a versioned catalog table").build(),
      ProcedureParameter.in("version", IntegerType)
        .comment("the manifest version to restore (must be retained)").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ident = GraftProcedures.identOf(input.getUTF8String(0).toString)
      val to = input.getInt(1)
      val newV = catalog.rollbackTable(ident, to)
      GraftProcedures.oneRowScan(
        new StructType()
          .add("restored_version", IntegerType, nullable = false)
          .add("new_version", IntegerType, nullable = false),
        Array[Any](to, newV))
    }
  }
}

/** `CALL graft.history(table)`: the version chain of a versioned table
  * — one row per manifest: (version, committed_at, files, bytes). The
  * observability face of the commit log: which load grew the table,
  * when the retention DELETE ran, what a VACUUM would reclaim. */
private[sources] class HistoryProcedure(catalog: GraftCatalog)
    extends UnboundProcedure {
  override def name(): String = "history"
  override def description(): String =
    "one row per commit of a versioned table: version, time, files, bytes"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "history"
    override def description(): String = HistoryProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("'namespace.table' of a versioned catalog table").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ident = GraftProcedures.identOf(input.getUTF8String(0).toString)
      val (dir, conf) = catalog.versionedTableDir(ident)
      val rows = GraftLog.versions(dir, conf).map { v =>
        // committed_at from the manifest's own ts (mtime only for
        // pre-r15 manifests) — commit metadata lives IN the commit
        val m = GraftLog.readManifest(dir, conf, v)
        val ts = m.ts.getOrElse(dir.getFileSystem(conf).getFileStatus(
          new HPath(new HPath(dir, GraftLog.Dir), s"v$v.json"))
          .getModificationTime)
        new GenericInternalRow(Array[Any](
          v, ts * 1000L, m.entries.length, m.entries.map(_.bytes).sum)): InternalRow
      }.toArray
      GraftProcedures.rowsScan(
        new StructType()
          .add("version", IntegerType, nullable = false)
          .add("committed_at", TimestampType, nullable = false)
          .add("files", IntegerType, nullable = false)
          .add("bytes", LongType, nullable = false),
        rows)
    }
  }
}
