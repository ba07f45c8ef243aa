package graft.sources

import java.util.{Map => JMap, UUID}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch WRITE path for the reference's `;`-CSV envelope
  * (SURVEY.md §2.2 K1) — the sink-side twin of [[PagedJsonSource]]:
  * where the K1 queries compose Spark's built-in CSV writer, this is
  * the engine-surface form — a `TableProvider` + `SupportsWrite` +
  * `BatchWrite` implementing the full two-phase distributed commit
  * protocol a production sink needs:
  *
  *  - each task streams its partition to a UNIQUELY-NAMED temp file
  *    (`_tmp_<queryId>/…-<taskId>`) and only its commit message
  *    publishes the file — a failed/speculative attempt leaves nothing
  *    visible, and Spark's commit coordinator guarantees one committed
  *    attempt per partition;
  *  - the driver's `commit(messages)` renames the committed temp files
  *    into place (rename, not copy — O(files) metadata ops), truncates
  *    the previous contents when the write is an overwrite, drops the
  *    temp dir, and stamps `_SUCCESS`; `abort()` removes the temp dir
  *    so failed jobs leave the target untouched;
  *  - output is RFC-4180-style `;`-CSV (quote doubling, quoted
  *    embedded separators/newlines, per-file header) — exactly what the
  *    S6 reader (`sep=';', header, multiLine`) round-trips.
  *
  * Usage: `df.write.format("graft.sources.GraftCsvSink")
  * .mode("overwrite").option("path", dir).save()`. The table reports
  * ACCEPT_ANY_SCHEMA and takes the row schema from `LogicalWriteInfo`
  * (string/boolean/integral/floating columns).
  */
class GraftCsvSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  // Write-only source: there is nothing to infer; the write schema
  // arrives via LogicalWriteInfo.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftCsvTable(properties.get("path"))
}

private[sources] class GraftCsvTable(path: String) extends Table with SupportsWrite {
  require(path != null, "graft-csv sink requires option(\"path\", …)")
  override def name(): String = s"graft_csv($path)"
  override def schema(): StructType = new StructType()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCsvWriteBuilder(path, info, truncate = false)
}

private[sources] class GraftCsvWriteBuilder(path: String, info: LogicalWriteInfo,
                                            truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftCsvWriteBuilder(path, info, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftCsvBatchWrite(path, info.schema(), info.queryId(), truncate)
  }
}

/** Commit message: the temp file this task wrote and the final name it
  * should be published under. */
private[sources] case class CsvFileCommit(tempFile: String, finalName: String)
  extends WriterCommitMessage

private[sources] class GraftCsvBatchWrite(path: String, schema: StructType,
                                          queryId: String, truncate: Boolean)
    extends BatchWrite {

  private def tmpDir = new HPath(path, s"_tmp_$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCsvWriterFactory(path, tmpDir.toString, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new HPath(path)
    val fs = root.getFileSystem(new Configuration())
    fs.mkdirs(root)
    if (truncate)
      fs.listStatus(root).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .foreach(s => fs.delete(s.getPath, false))
    messages.foreach { case CsvFileCommit(tempFile, finalName) =>
      val target = new HPath(root, finalName)
      if (fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(new HPath(tempFile), target))
        throw new java.io.IOException(s"graft-csv: rename $tempFile -> $target failed")
    }
    fs.delete(tmpDir, true)
    fs.create(new HPath(root, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new HPath(path).getFileSystem(new Configuration())
    fs.delete(tmpDir, true)
  }
}

private[sources] class GraftCsvWriterFactory(path: String, tmpDir: String,
                                             schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCsvDataWriter(tmpDir, schema, partitionId, taskId)
}

private[sources] class GraftCsvDataWriter(tmpDir: String, schema: StructType,
                                          partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // taskId-unique temp file: concurrent attempts for the same partition
  // (retry, speculation) can never collide.
  private val tempFile =
    new HPath(tmpDir, f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.csv")
  private val fs: FileSystem = tempFile.getFileSystem(new Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tempFile, true),
      java.nio.charset.StandardCharsets.UTF_8))
  out.write(schema.fieldNames.map(quote).mkString(";")); out.write("\n")

  private def quote(s: String): String =
    if (s.exists(c => c == ';' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) ""
    else dt match {
      case StringType => quote(row.getUTF8String(i).toString)
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case other => throw new UnsupportedOperationException(
        s"graft-csv sink: unsupported column type $other")
    }

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(';')
      sb.append(render(row, i, schema(i).dataType))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString())
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    CsvFileCommit(tempFile.toString, f"part-$partitionId%05d.csv")
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tempFile, false)
  }

  override def close(): Unit = ()
}
