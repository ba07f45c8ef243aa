package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def d = TestSpark.sf0001

  test("funnel stages are monotonically non-increasing and stage 1 is 100%") {
    val rows = Analytics.funnel(Tables.events(spark, d),
        Seq("signup", "view", "purchase"))
      .orderBy("stage").collect()
    assert(rows.length == 3)
    val users = rows.map(_.getAs[Long]("n_users"))
    assert(users.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel widened downstream: ${users.mkString(",")}")
    assert(rows.head.getAs[Double]("pct_of_first") == 1.0)
  }

  test("cohort retention: offset 0 cell equals the cohort's full user count") {
    val ev = Tables.events(spark, d)
    val grid = Analytics.cohortRetention(ev).collect()
    assert(grid.forall(_.getAs[Long]("offset_week") >= 0))
    // every user is active in their own first week, so the offset-0 cell
    // is exactly the cohort size — and no later cell can exceed it.
    val byCohort = grid.groupBy(_.getAs[Long]("cohort_week"))
    byCohort.foreach { case (_, cells) =>
      val at0 = cells.find(_.getAs[Long]("offset_week") == 0L).map(_.getAs[Long]("n_users"))
      assert(at0.nonEmpty)
      assert(cells.forall(_.getAs[Long]("n_users") <= at0.get))
    }
  }

  test("basket lift: pairs ordered, support floor respected, lift positive") {
    val out = Analytics.basketLift(Tables.lineitem(spark, d), 2, 20).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("n_co") >= 2)
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("fuzzy linkage honors the distance cap and block key") {
    val c = Tables.customer(spark, d)
    val pairs = Analytics.fuzzyLinkage(c, 2)
    assert(pairs.filter(col("dist") > 2).isEmpty)
    // every reported pair shares the blocking key (re-derive via join)
    val withBlocks = pairs
      .join(c.select(col("c_custkey").as("key_a"),
        col("c_nationkey").as("na"), col("c_mktsegment").as("ma")), Seq("key_a"))
      .join(c.select(col("c_custkey").as("key_b"),
        col("c_nationkey").as("nb"), col("c_mktsegment").as("mb")), Seq("key_b"))
    assert(withBlocks.filter(col("na") =!= col("nb") || col("ma") =!= col("mb")).isEmpty)
  }

  test("sorted-neighborhood linkage: sound pairs, planted head/tail edits found") {
    import spark.implicits._
    val planted = Seq(
      (9002L, "Customer#000001234", 7L, "BUILDING"),
      (9003L, "Customer#00001234", 7L, "BUILDING"),  // tail edit — adjacent in pass 1
      (9004L, "Xustomer#000001234", 7L, "BUILDING"), // head edit — adjacent in pass 2
      (9005L, "Customer#999912340", 7L, "BUILDING")  // far from all
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val c = Tables.customer(spark, d)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .union(planted)
    val out = Analytics.fuzzyLinkage(c, 2, 10)
    val found = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // Soundness: every emitted pair is a true within-block pair at
    // distance ≤ cap (the blocking may drop distant-rank pairs, but can
    // never invent one).
    val brute = c.as("a").join(c.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_mktsegment") === col("b.c_mktsegment") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey"), col("b.c_custkey"),
        levenshtein(col("a.c_name"), col("b.c_name")).cast("long").as("dist"))
      .filter(col("dist") <= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert((found -- brute).isEmpty,
      s"blocking invented pairs: ${(found -- brute).take(5)}")
    // The complementary sort passes must catch a tail edit (shared
    // prefix → adjacent ascending) and a head edit (shared suffix →
    // adjacent reversed).
    assert(found.contains((9002L, 9003L, 1L)), "tail-edit pair not found")
    assert(found.contains((9002L, 9004L, 1L)), "head-edit pair not found")
  }

  test("gap fill: dense spine, exact at observations, interpolation bracketed") {
    val out = Analytics.gapFillHourly(Tables.events(spark, d), "view", 10L)
      .orderBy("user_id", "hr").collect()
    assert(out.nonEmpty)
    // dense: consecutive hours per user
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val hrs = rows.map(_.getAs[Long]("hr")).sorted
      assert(hrs.zip(hrs.tail).forall(p => p._2 == p._1 + 1), "hole in the hour spine")
    }
    out.foreach { r =>
      val v = Option(r.getAs[java.lang.Double]("v")).map(_.doubleValue)
      val interp = r.getAs[Double]("v_interp")
      v.foreach(obs => assert(interp == obs, "interp must equal the observation where present"))
    }
  }

  test("snapshot diff classifies inserts/deletes/updates and drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k0", "v0")
    val neu = Seq((2L, 21.0), (3L, 30.0), (4L, 40.0)).toDF("k0", "v0")
    val out = Analytics.snapshotDiff(old, neu, "k0", "v0")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("change"))).toMap
    assert(out == Map(1L -> "delete", 2L -> "update", 4L -> "insert"))
  }

  test("count-min estimates never undercount and match exact when collision-free") {
    val out = Analytics.countMinEstimates(Tables.events(spark, d), 4, 32).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"))
      assert(r.getAs[Boolean]("sketch_ok"))
    }
    // a huge sketch (width >> keys) has no collisions: est == exact
    val wide = Analytics.countMinEstimates(Tables.events(spark, d), 4, 1 << 20).collect()
    wide.foreach(r => assert(r.getAs[Long]("est") == r.getAs[Long]("exact")))
  }

  test("distributed AUC equals the brute-force pair count") {
    import spark.implicits._
    val scored = Seq(
      (0.1, 0), (0.2, 1), (0.2, 0), (0.35, 0), (0.5, 1),
      (0.5, 0), (0.5, 1), (0.8, 1), (0.9, 0), (0.95, 1)).toDF("score", "y")
    val auc = Analytics.rocAuc(scored, "score", "y")
      .collect().head.getAs[Double]("auc")
    // brute force: P(score_pos > score_neg) + 0.5 P(equal)
    val rows = scored.collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val brute = wins / (pos.length * neg.length)
    assert(math.abs(auc - brute) < 1e-9, s"auc=$auc brute=$brute")
    assert(auc >= 0 && auc <= 1)
  }

  test("calibration deciles partition the input into near-equal buckets") {
    val out = Analytics.calibration(
        Tables.orders(spark, d).select(col("o_orderkey"),
          col("o_totalprice").as("score"), lit(0).as("y")),
        "score", "y", "o_orderkey")
      .collect()
    assert(out.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val sizes = out.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1, s"uneven ntile: ${sizes.mkString(",")}")
    val total = Tables.orders(spark, d).count()
    assert(sizes.sum == total)
  }

  test("rolling WAU dominates daily actives and never exceeds total users") {
    val ev = Tables.events(spark, d)
    val wau = Analytics.rollingWau(ev, 7)
      .collect().map(r => r.getAs[Long]("day_out") -> r.getAs[Long]("wau")).toMap
    val dau = ev.select(expr("unix_timestamp(ts) div 86400").as("day"), col("user_id"))
      .distinct().groupBy("day").agg(countDistinct("user_id").as("dau"))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("dau")).toMap
    val total = ev.select(countDistinct("user_id")).collect().head.getLong(0)
    dau.foreach { case (day, n) =>
      assert(wau(day) >= n, s"wau(${day}) < dau")
      assert(wau(day) <= total)
    }
    // spine is dense across the observed day range
    val days = wau.keys.toSeq.sorted
    assert(days.zip(days.tail).forall(p => p._2 == p._1 + 1))
  }

  test("binned interval overlap equals the direct quadratic join") {
    val o = Tables.orders(spark, d)
    val binned = Analytics.intervalOverlap(o, 500L, 604800L, 604800L)
      .collect().map(r => r.getAs[Long]("a_key") -> r.getAs[Long]("n_overlaps")).toMap
    val iv = o.filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey").as("key"), unix_timestamp(col("o_orderdate")).as("s"))
      .withColumn("e", col("s") + 604800L)
    val a = iv.filter(col("key") % 2 === 0)
    val b = iv.filter(col("key") % 2 === 1)
      .select(col("key").as("b_key"), col("s").as("b_s"), col("e").as("b_e"))
    val direct = a.crossJoin(b)
      .filter(col("s") < col("b_e") && col("b_s") < col("e"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("n")).toMap
    assert(binned == direct)
  }

  test("k-anonymity audit only reports groups under k, sizes re-derivable") {
    val c = Tables.customer(spark, d)
    val flagged = Analytics.kAnonymityAudit(c, 5L).collect()
    flagged.foreach(r => assert(r.getAs[Long]("n") < 5))
    val actual = c.groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("balance_band"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("balance_band")) -> r.getAs[Long]("n")).toMap
    flagged.foreach { r =>
      val key = (r.getAs[Long]("nation"), r.getAs[String]("segment"),
        r.getAs[Long]("balance_band"))
      assert(actual(key) == r.getAs[Long]("n"))
    }
  }

  test("period-over-period deltas are consistent and first month is null") {
    val rows = Analytics.periodOverPeriod(
        Tables.lineitem(spark, d), Tables.orders(spark, d), Tables.customer(spark, d),
        Tables.nation(spark, d), Tables.region(spark, d))
      .collect()
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (_, months) =>
      val sorted = months.sortBy(_.getAs[Long]("yyyymm"))
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev_revenue")))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getAs[Double]("prev_revenue") == prev.getAs[Double]("revenue"))
          val expect = BigDecimal(cur.getAs[Double]("revenue") - cur.getAs[Double]("prev_revenue"))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(cur.getAs[Double]("delta") == expect)
        case _ => ()
      }
    }
  }

  test("gini equals the closed form on a hand-computed ladder, bounded in [0,1]") {
    import spark.implicits._
    // equal spend → G = 0 exactly
    val flat = (1L to 8L).map(k => (k, 100.0)).toDF("o_custkey", "o_totalprice")
    assert(Analytics.giniConcentration(flat).collect().head.getAs[Double]("gini") == 0.0)
    // ladder 1..4 (one order per customer): G = (2·Σi·i − 5·Σi)/(4·Σi) = 0.25
    val ladder = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("o_custkey", "o_totalprice")
    assert(Analytics.giniConcentration(ladder).collect().head.getAs[Double]("gini") == 0.25)
    // real data: bounded and deterministic under repartitioning
    val o = Tables.orders(spark, d)
    val g1 = Analytics.giniConcentration(o).collect().head
    val g2 = Analytics.giniConcentration(o.repartition(7)).collect().head
    assert(g1.getAs[Double]("gini") == g2.getAs[Double]("gini"))
    assert(g1.getAs[Double]("gini") >= 0.0 && g1.getAs[Double]("gini") <= 1.0)
  }

  test("markov transitions: rows per from-state sum to p=1, counts match a direct pass") {
    val out = Analytics.markovTransitions(Tables.events(spark, d)).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("from_type")).foreach { case (_, rows) =>
      val psum = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"p rows sum to $psum")
    }
    // total transitions = Σ per-user (events − 1)
    val perUser = Tables.events(spark, d).groupBy("user_id").count().collect()
    val expected = perUser.map(r => math.max(0L, r.getAs[Long]("count") - 1)).sum
    assert(out.map(_.getAs[Long]("n")).sum == expected)
  }

  test("benford audit: digits 1-9 cover every positive row, probabilities sum to 1") {
    val o = Tables.orders(spark, d)
    val out = Analytics.benfordAudit(o).collect()
    assert(out.map(_.getAs[Long]("digit")).forall(dg => dg >= 1 && dg <= 9))
    assert(out.map(_.getAs[Long]("n")).sum == o.filter(col("o_totalprice") > 0).count())
    assert(math.abs(out.map(_.getAs[Double]("p")).sum - 1.0) < 1e-4)
    // the theoretical column is the Benford mass function (sums to 1 over 1..9)
    val benfordSum = (1 to 9).map(dg => math.log10(1.0 + 1.0 / dg)).sum
    assert(math.abs(benfordSum - 1.0) < 1e-12)
    out.foreach { r =>
      val expect = BigDecimal(math.log10(1.0 + 1.0 / r.getAs[Long]("digit")))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("benford_p") == expect)
    }
  }

  test("mannKendall: S matches the brute-force pairwise sign sum") {
    val o = Tables.orders(spark, d)
    val out = Analytics.mannKendall(o).collect()
    assert(out.length == 1)
    val n = out.head.getAs[Long]("n_months")
    val s = out.head.getAs[Long]("s_stat")
    val maxPairs = n * (n - 1) / 2
    assert(n > 1 && math.abs(s) <= maxPairs)
    // replay S from the same monthly aggregate, driver-side
    val monthly = o
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("m"))
      .agg(round(graft.functions.Num.dsum(col("o_totalprice")), 6).as("x"))
      .orderBy("m").collect().map(_.getAs[Double]("x"))
    val sBrute = (for { i <- monthly.indices; j <- i + 1 until monthly.length }
      yield math.signum(monthly(j) - monthly(i)).toLong).sum
    assert(s == sBrute)
    val tauExpect = BigDecimal(s / (maxPairs / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("tau") == tauExpect)
  }

  test("joinKeySkewReport: totals re-derive from the raw table") {
    val ev = Tables.events(spark, d)
    val out = Analytics.joinKeySkewReport(ev, "user_id", 10.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_rows") == ev.count())
    assert(r.getAs[Long]("n_keys") == ev.select("user_id").distinct().count())
    assert(r.getAs[Long]("max_cnt") >= r.getAs[Long]("min_cnt"))
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
    assert(r.getAs[Double]("top1_share") > 0.0 && r.getAs[Double]("top1_share") <= 1.0)
  }

  test("theilSen: median slope sits between the extreme pairwise slopes") {
    val o = Tables.orders(spark, d)
    val out = Analytics.theilSen(o).collect()
    assert(out.length == 1)
    val n = out.head.getAs[Long]("n_pairs")
    val med = out.head.getAs[Double]("slope_median")
    // replay the slope set driver-side from the same monthly aggregate
    val dcol = to_date(col("o_orderdate"))
    val monthly = o.groupBy((year(dcol) * 12 + month(dcol)).cast("long").as("mi"))
      .agg(round(graft.functions.Num.dsum(col("o_totalprice")), 6).as("x"))
      .orderBy("mi").collect()
      .map(r => (r.getAs[Long]("mi"), r.getAs[Double]("x")))
    val slopes = for {
      i <- monthly.indices; j <- i + 1 until monthly.length
    } yield (monthly(j)._2 - monthly(i)._2) / (monthly(j)._1 - monthly(i)._1)
    assert(n == slopes.length)
    assert(med >= slopes.min - 1e-6 && med <= slopes.max + 1e-6)
  }

  test("zscoreDailyAnomalies: every flagged day recomputes past the threshold") {
    val o = Tables.orders(spark, d)
    val out = Analytics.zscoreDailyAnomalies(o, 2.0).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getAs[Double]("z")) >= 2.0))
    // z recomputes from the daily series, driver-side
    val daily = o.groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(round(graft.functions.Num.dsum(col("o_totalprice")), 6).as("x"))
      .collect().map(_.getAs[Double]("x"))
    val n = daily.length.toDouble
    val mean = daily.sum / n
    val sd = math.sqrt(daily.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    out.foreach { r =>
      val z = (r.getAs[Double]("revenue") - mean) / sd
      assert(math.abs(z - r.getAs[Double]("z")) < 1e-3)
    }
  }

  test("funnelLatency: one row per step, n matches the funnel, median ≤ p90") {
    val ev = Tables.events(spark, d)
    val stages = Seq("signup", "view", "purchase")
    val lat = Analytics.funnelLatency(ev, stages).orderBy("step").collect()
    assert(lat.length == stages.size - 1)
    val funnelCounts = Analytics.funnel(ev, stages).orderBy("stage")
      .collect().map(_.getAs[Long]("n_users"))
    lat.zipWithIndex.foreach { case (r, i) =>
      // step i converts exactly the users counted at funnel stage i+2
      assert(r.getAs[Long]("n_users") == funnelCounts(i + 1))
      val med = r.getAs[Double]("median_hours")
      val p90 = r.getAs[Double]("p90_hours")
      assert(med > 0 && p90 >= med)
    }
  }

  test("columnProfile: totals re-derive, distincts bounded, values render") {
    val o = Tables.orders(spark, d)
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = Analytics.columnProfile(o, cols).collect()
    assert(out.length == cols.size)
    val n = o.count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[String]("min_value").nonEmpty)
      assert(r.getAs[String]("max_value").nonEmpty)
    }
    val key = out.find(_.getAs[String]("column") == "o_orderkey").get
    assert(key.getAs[Long]("n_distinct") == n)
  }

  test("readability buckets agree with the flesch thresholds") {
    val out = graft.operators.TextAnalysis.readability(
      Tables.documents(spark, d)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getAs[Double]("flesch")
      val expected = if (f >= 60) "easy" else if (f >= 30) "medium" else "hard"
      assert(r.getAs[String]("bucket") == expected)
    }
  }
}
