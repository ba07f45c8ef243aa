package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{JsonFixtureSource, PagedJsonSource}

/** The DataSource V2 paged-JSON provider: row parity with the table it
  * was generated from, source-side filtering, and loud failure on a
  * broken page chain (a silently dropped page would be data loss). */
class PagedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private def freshFixture(name: String): String = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_pagedspec_${name}_" +
      ProcessHandle.current().pid()
    JsonFixtureSource.writeSearchPagesPartitioned(
      spark, Tables.orders(spark, d), path, keysPerPage = 500L)
    path
  }

  private def readPaged(path: String) =
    spark.read.format("graft.sources.PagedJsonSource").option("path", path).load()

  test("paged source returns every order exactly once, schema flattened") {
    val path = freshFixture("parity")
    val got = readPaged(path).select("video_id").collect().map(_.getString(0)).toSet
    val want = Tables.orders(spark, d)
      .select(col("o_orderkey").cast("string")).collect().map(_.getString(0)).toSet
    assert(got == want)
  }

  test("pushed publishedAfter bound filters inside the source") {
    val path = freshFixture("filter")
    val bound = PagedJsonSource.PublishedAfter
    val got = readPaged(path).filter(col("published_at") > bound).count()
    val want = Tables.orders(spark, d)
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'") > bound)
      .count()
    assert(got == want)
    assert(got > 0 && got < Tables.orders(spark, d).count(),
      "bound should be selective for the fixture data")
  }

  test("a broken nextPageToken chain fails loudly instead of dropping pages") {
    val path = freshFixture("broken")
    // Corrupt one middle page's token in place.
    val pageDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("page=")).sortBy(_.getName)
    assume(pageDirs.length >= 3, "need several pages to corrupt a middle one")
    val part = pageDirs(1).listFiles().filter(_.getName.startsWith("part-")).head
    val txt = new String(Files.readAllBytes(part.toPath), "UTF-8")
    assert(txt.contains("tok_"), "middle page should carry a token")
    Files.write(part.toPath,
      txt.replaceAll("\"nextPageToken\":\"tok_\\d+\"", "\"nextPageToken\":\"tok_999999\"")
        .getBytes("UTF-8"))
    // Drop the Hadoop LocalFS checksum sidecar — otherwise the CRC
    // mismatch fires before the reader's own chain validation.
    val crc = new java.io.File(pageDirs(1), s".${part.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    val e = intercept[Exception] { readPaged(path).count() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("broken page chain")),
      s"expected the broken-chain error, got: ${chain(e).mkString(" | ")}")
  }

  test("column pruning is pushed into the source (ReadSchema = projection)") {
    val path = freshFixture("prune")
    val df = readPaged(path).select("title")
    val scans = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("title"),
      s"source should read only the projection, got ${scans.head.scan.readSchema()}")
    // values still correct under the pruned read
    val got = df.collect().map(_.getString(0)).sorted
    val want = Tables.orders(spark, d)
      .select(col("o_orderpriority")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("COUNT(*) is pushed into the source as per-page partial counts") {
    val path = freshFixture("countpush")
    val df = readPaged(path).groupBy().count()
    val scans = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.getClass.getSimpleName == "PagedCountScan",
      s"expected the pushed-count scan, got ${scans.head.scan.description()}")
    assert(df.collect().head.getLong(0) == Tables.orders(spark, d).count())
    // composed with a pushed filter: the per-page counts respect it
    val bound = PagedJsonSource.PublishedAfter
    val filtered = readPaged(path).filter(col("published_at") > bound).groupBy().count()
    val fs = filtered.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(fs.head.scan.getClass.getSimpleName == "PagedCountScan")
    val want = Tables.orders(spark, d)
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'") > bound)
      .count()
    assert(filtered.collect().head.getLong(0) == want)
    // a grouped aggregate is declined: the row scan plans instead
    val grouped = readPaged(path).groupBy("title").count()
    val gs = grouped.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(gs.head.scan.isInstanceOf[graft.sources.PagedScan])
  }

  test("reported size statistics make the small API mirror broadcastable") {
    val path = freshFixture("stats")
    // the scan reports the real on-disk page bytes
    val df = readPaged(path)
    val scan = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[graft.sources.PagedScan]
    val want = new java.io.File(path).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("page="))
      .flatMap(_.listFiles()).filter(_.getName.startsWith("part-"))
      .map(_.length()).sum
    assert(scan.estimateStatistics().sizeInBytes().getAsLong == want)
    assert(want > 0)
    // and Catalyst actually picks a broadcast join for it (a stats-less
    // DSV2 relation defaults to defaultSizeInBytes = never broadcast)
    val big = Tables.orders(spark, d)
      .select(col("o_orderkey").cast("string").as("video_id"), col("o_totalprice"))
    val joined = big.join(df, Seq("video_id"))
    val bhj = joined.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "expected the paged side to broadcast:\n" +
      joined.queryExecution.sparkPlan.toString)
  }

  test("runtime key-set filtering drops non-matching items inside the reader") {
    val path = freshFixture("runtime")
    val keys = Tables.orders(spark, d).select(col("o_orderkey").cast("string"))
      .limit(5).collect().map(_.getString(0)).toSet
    val scan = new graft.sources.PagedScan(path, Array.empty)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("video_id", keys.toArray[Any])))
    val parts = scan.planInputPartitions()
    val factory = scan.createReaderFactory()
    val got = scala.collection.mutable.Set[String]()
    parts.foreach { p =>
      val r = factory.createReader(p)
      try while (r.next()) got += r.get().getUTF8String(0).toString
      finally r.close()
    }
    assert(got == keys, s"reader must emit exactly the runtime key set; got ${got.size}")
    // a second filter call intersects (Spark may pass several)
    val scan2 = new graft.sources.PagedScan(path, Array.empty)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("video_id", keys.toArray[Any]),
      org.apache.spark.sql.sources.EqualTo("video_id", keys.head)))
    val f2 = scan2.createReaderFactory()
    val got2 = scala.collection.mutable.Set[String]()
    scan2.planInputPartitions().foreach { p =>
      val r = f2.createReader(p)
      try while (r.next()) got2 += r.get().getUTF8String(0).toString
      finally r.close()
    }
    assert(got2 == Set(keys.head))
  }

  test("custom metrics report parse/filter work per reader") {
    val path = freshFixture("metrics")
    val scan = new graft.sources.PagedScan(path,
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.GreaterThan(
          "published_at", PagedJsonSource.PublishedAfter)))
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ==
      Set("pagesRead", "itemsParsed", "itemsFiltered"))
    val factory = scan.createReaderFactory()
    var (pages, parsed, filtered, emitted) = (0L, 0L, 0L, 0L)
    scan.planInputPartitions().foreach { p =>
      val r = factory.createReader(p)
      try {
        while (r.next()) emitted += 1
        val m = r.currentMetricsValues().map(x => x.name() -> x.value()).toMap
        pages += m("pagesRead"); parsed += m("itemsParsed")
        filtered += m("itemsFiltered")
      } finally r.close()
    }
    assert(pages == scan.planInputPartitions().length.toLong)
    assert(parsed == Tables.orders(spark, d).count())
    assert(filtered > 0 && parsed == filtered + emitted,
      s"parsed=$parsed filtered=$filtered emitted=$emitted must balance")
  }
}
