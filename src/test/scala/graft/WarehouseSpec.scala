package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Warehouse

class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join result equals the plain join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val o = Tables.orders(spark, TestSpark.sf0001)
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    val salted = Warehouse.saltedJoin(li, o, "l_orderkey", "o_orderkey",
      col("l_linenumber"), 8).count()
    assert(salted == plain)
  }

  test("approx distinct is within the configured error of exact") {
    // Raw-estimate bound (the query itself now emits the derived verdict
    // column, so assert the underlying sketch error here directly).
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val r = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts")).collect().head
    val approx = r.getAs[Long]("approx_parts").toDouble
    val exact = r.getAs[Long]("exact_parts").toDouble
    assert(math.abs(approx - exact) / exact < 0.1)
    // And the shipped query's verdict column is 1 (within 5%).
    val q = SparkEntry.queries("q_x_approx_distinct")(spark, TestSpark.sf0001)
      .collect().head
    assert(q.getAs[Long]("approx_within_5pct") == 1L)
  }

  test("upsert: changes override, inserts land, untouched rows carry over") {
    import spark.implicits._
    val cur = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("key", "status", "price")
    val changes = Seq((2L, "B", 21.0), (9L, "new", 90.0))
      .toDF("key", "status", "price")
    val out = Warehouse.upsert(cur, changes, "key")
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("status"), r.getAs[Double]("price")))
      .toSet
    assert(out == Set(
      (1L, "a", 10.0),  // untouched
      (2L, "B", 21.0),  // updated
      (3L, "c", 30.0),  // untouched
      (9L, "new", 90.0) // inserted
    ))
  }

  test("upsert: an explicit NULL in a change row overwrites the current value") {
    import spark.implicits._
    val cur = Seq((1L, Some("a")), (2L, Some("b"))).toDF("key", "status")
    val changes = Seq((2L, None: Option[String])).toDF("key", "status")
    val out = Warehouse.upsert(cur, changes, "key")
      .collect()
      .map(r => (r.getAs[Long]("key"), Option(r.getAs[String]("status"))))
      .toSet
    // MERGE semantics: the change row wins wholesale, so key 2's status
    // becomes NULL — a per-column coalesce would have kept "b".
    assert(out == Set((1L, Some("a")), (2L, None)))
  }

  test("binned range join equals the direct non-equi join") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 25L), (5L, -3L))
      .toDF("p_id", "sec")
    val intervals = Seq((100L, 0L, 10L), (200L, 9L, 20L), (300L, 30L, 40L))
      .toDF("i_id", "start_sec", "end_sec")
    val binned = Warehouse.binnedRangeJoin(points, intervals, 7L)
      .select("i_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = points.join(intervals,
        col("sec") >= col("start_sec") && col("sec") < col("end_sec"))
      .select("i_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == direct)
    assert(binned == Set((100L, 1L), (200L, 2L), (200L, 3L))) // 25, -3 unmatched
  }

  test("binned range join equals direct join over randomized cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val pts = Seq.fill(25)((rnd.nextLong(50), rnd.between(-100L, 100L)))
        .toDF("p_id", "sec")
      val ivs = Seq.fill(12) {
        val st = rnd.between(-100L, 100L)
        (rnd.between(100L, 150L), st, st + rnd.between(1L, 60L))
      }.toDF("i_id", "start_sec", "end_sec")
      val binWidth = rnd.between(1L, 25L)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("i_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val binned = pairs(Warehouse.binnedRangeJoin(pts, ivs, binWidth))
      val direct = pairs(pts.join(ivs,
        col("sec") >= col("start_sec") && col("sec") < col("end_sec")))
      assert(binned == direct, s"binWidth=$binWidth")
    }
  }

  test("scd2: collapses no-change rows, versions close with the next start") {
    import spark.implicits._
    val log = Seq(
      (1L, "bronze", "2024-01-01 00:00:00", 1L),
      (1L, "bronze", "2024-01-02 00:00:00", 2L), // no change → collapses
      (1L, "silver", "2024-01-03 00:00:00", 3L),
      (1L, "gold",   "2024-01-05 00:00:00", 4L),
      (2L, "bronze", "2024-01-04 00:00:00", 5L)
    ).toDF("user_id", "attr", "ts_s", "event_id")
      .select(col("user_id"), col("attr"), to_timestamp(col("ts_s")).as("ts"),
        col("event_id"))
    val out = Warehouse.scd2(log, "user_id", "attr", "ts", "event_id")
      .select(col("user_id"), col("attr"),
        date_format(col("ts"), "yyyy-MM-dd").as("vf"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd").as("vt"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4))).toSet
    assert(out == Set(
      (1L, "bronze", "2024-01-01", Some("2024-01-03"), 0L),
      (1L, "silver", "2024-01-03", Some("2024-01-05"), 0L),
      (1L, "gold",   "2024-01-05", None, 1L),
      (2L, "bronze", "2024-01-04", None, 1L)))
  }

  test("scd2: NULL attr runs collapse, NULL→value transitions version") {
    import spark.implicits._
    val log = Seq(
      (1L, None: Option[String], "2024-01-01 00:00:00", 1L),
      (1L, None: Option[String], "2024-01-02 00:00:00", 2L), // NULL→NULL collapses
      (1L, Some("x"), "2024-01-03 00:00:00", 3L)
    ).toDF("user_id", "attr", "ts_s", "event_id")
      .select(col("user_id"), col("attr"), to_timestamp(col("ts_s")).as("ts"),
        col("event_id"))
    val out = Warehouse.scd2(log, "user_id", "attr", "ts", "event_id").collect()
    assert(out.length == 2)
  }

  test("ewma equals the per-row weighted-mean reference computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 40).map(i =>
      (i.toLong, (i % 3).toLong, rnd.nextInt(1000) / 100.0))
    val df = rows.toDF("event_id", "user_id", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, 0, 0, event_id)"))
    val alpha = 0.5
    val span = 8
    val got = Warehouse.ewma(df, Seq("user_id"), Seq(col("ts"), col("event_id")),
        col("value"), alpha, span)
      .select("event_id", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: brute-force trailing weighted mean per user in plain Scala
    rows.groupBy(_._2).foreach { case (_, us) =>
      val ordered = us.sortBy(_._1)
      ordered.zipWithIndex.foreach { case ((id, _, _), i) =>
        val window = ordered.slice(math.max(0, i - span + 1), i + 1).reverse
        val numer = window.zipWithIndex
          .map { case ((_, _, v), kk) => v * math.pow(1 - alpha, kk) }.sum
        val denom = (0 until window.size).map(kk => math.pow(1 - alpha, kk)).sum
        val want = BigDecimal(numer / denom)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got(id) - want) < 1e-9, s"event $id: ${got(id)} vs $want")
      }
    }
  }

  test("sessionize splits on the gap and keeps per-user totals") {
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (2L, "2024-01-01 00:30:00", 1L, 5.0),  // same session (gap 30m < 2h)
      (3L, "2024-01-01 05:00:00", 1L, 2.0),  // new session
      (4L, "2024-01-01 00:00:00", 2L, 7.0)
    ).toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("value"))
    val out = Warehouse.sessionize(events, 7200L)
      .orderBy("user_id", "session_no").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Double]("sum_value") == 15.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }
}
