package graft.sources

import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` for the reference's paginated search
  * API shape (SURVEY.md §2.1 S1): a directory of token-chained JSON
  * pages (`{items: [{id: {videoId}, snippet: {publishedAt, title,
  * description}}], nextPageToken}`), exposed as a flat table with the
  * `publishedAfter` predicate (`…final.py:137`) pushed INTO the source
  * — the engine-surface form of what `JsonFixtureSource` does with
  * composed built-ins.
  *
  * Scale shape: `planInputPartitions` does METADATA-ONLY work (one
  * directory listing; no page payload is read on the driver) and emits
  * one partition per page, so page fetches parse in parallel across the
  * cluster; each reader validates its page's `nextPageToken` against
  * the planner's layout, so a broken chain fails loudly instead of
  * silently dropping pages. Filters accepted by [[PagedScanBuilder]]
  * are evaluated inside the reader — rows failing `publishedAfter`
  * never leave the source (the DSv2 equivalent of the API's server-side
  * query parameter), and Spark plans NO residual filter for them.
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource")
  * .option("path", dir).load()`.
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PagedJsonTable(properties.get("path"))
}

object PagedJsonSource {
  /** One row per item, flattened exactly like the reference's S1
    * projection (timestamps stay in the API's ISO-8601 surface form —
    * lexicographic order IS chronological order, which is what makes
    * the pushed string comparison correct). */
  val Schema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("published_at", StringType),
    StructField("title", StringType),
    StructField("description", StringType)))

  /** The `publishedAfter` bound shared by `q_s1_paged_source` and its
    * oracle. */
  val PublishedAfter = "1995-06-30T23:59:59Z"
}

private[sources] class PagedJsonTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path)
}

/** Accepts `published_at > v` / `>= v` (string bounds — the API's
  * `publishedAfter`); everything else is left for Spark to evaluate. */
private[sources] class PagedScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case GreaterThan("published_at", _: String) => true
      case GreaterThanOrEqual("published_at", _: String) => true
      // Catalyst derives IsNotNull from any null-intolerant comparison;
      // claim it too or it survives as a residual FilterExec.
      case IsNotNull("published_at") => true
      case _ => false
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new PagedScan(path, pushed)
}

private[sources] case class PageInputPartition(file: String, page: Long,
                                               expectedToken: String) extends InputPartition

class PagedScan(path: String, val pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = PagedJsonSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftPagedJson path=$path PushedFilters: [${pushed.mkString(", ")}]"

  /** Metadata-only planning: list `page=N` directories (one FS call),
    * sort, and pair each page with the token it must carry (the next
    * page in the layout, or none for the last). Payloads are read only
    * by the executors. */
  override def planInputPartitions(): Array[InputPartition] = {
    val root = new HPath(path)
    val fs: FileSystem =
      root.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
    val dirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("page="))
      .map(s => (s.getPath.getName.stripPrefix("page=").toLong, s.getPath))
      .sortBy(_._1)
    dirs.zipWithIndex.map { case ((pg, dir), i) =>
      val file = fs.listStatus(dir)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-") && f.getLen > 0)
        .head.getPath.toString
      val expected = if (i + 1 < dirs.length) s"tok_${dirs(i + 1)._1}" else null
      PageInputPartition(file, pg, expected): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(pushed)
}

private[sources] class PagedReaderFactory(pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PagedReader(p.asInstanceOf[PageInputPartition], pushed)
}

/** Parses ONE page file (a single JSON object line), validates its
  * `nextPageToken` against the planner's layout, and streams the items
  * that pass the pushed filters. */
private[sources] class PagedReader(part: PageInputPartition, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val items: Iterator[JsonNode] = {
    val p = new HPath(part.file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    val token = Option(root.get("nextPageToken")).map(_.asText()).orNull
    if (token != part.expectedToken)
      throw new IllegalStateException(
        s"paged_json: page ${part.page} carries nextPageToken=$token, " +
          s"expected ${part.expectedToken} — broken page chain")
    val arr = root.get("items")
    if (arr == null) Iterator.empty
    else Iterator.tabulate(arr.size())(arr.get)
  }

  private var row: InternalRow = _

  private def text(n: JsonNode, field: String): String = {
    val v = if (n == null) null else n.get(field)
    if (v == null || v.isNull) null else v.asText()
  }

  private def passes(published: String): Boolean = pushed.forall {
    case GreaterThan("published_at", v: String) => published != null && published > v
    case GreaterThanOrEqual("published_at", v: String) => published != null && published >= v
    case IsNotNull("published_at") => published != null
    case _ => true
  }

  override def next(): Boolean = {
    while (items.hasNext) {
      val it = items.next()
      val snippet = it.get("snippet")
      val published = text(snippet, "publishedAt")
      if (passes(published)) {
        def utf8(s: String): UTF8String =
          if (s == null) null else UTF8String.fromString(s)
        row = InternalRow(
          utf8(text(it.get("id"), "videoId")),
          utf8(published),
          utf8(text(snippet, "title")),
          utf8(text(snippet, "description")))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
