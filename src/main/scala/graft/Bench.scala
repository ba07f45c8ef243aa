package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session("graft-bench")
    // Warm the JVM/codegen path once so the first measured query doesn't
    // absorb all JIT/classload cost, and pre-write the deterministic
    // fixtures so fixture-backed queries time their read path, not setup.
    SparkEntry.entry(spark).count()
    packs.SinksPack.prewarm(spark, sfDir)
    // Median of 3 runs per query: single-run timings vary 2-4× run to
    // run (JIT, page cache, AQE re-plans) — medians make round-over-round
    // BENCH comparisons signal instead of noise. The first run (recorded
    // separately) additionally absorbs any fixture setup.
    val runs = 3
    // Dev-only subset (comma-separated name prefixes): time just the
    // queries under iteration without paying for the whole suite. The
    // driver sets no prefix → full suite.
    val prefixes = sys.env.get("SPARK_GRAFT_BENCH_PREFIX")
      .map(_.split(',').toSeq).getOrElse(Seq(""))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .map { case (name, fn) =>
      var failed = false
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        // Time a noop-sink WRITE, not count(): under a bare count()
        // Catalyst's ColumnPruning drops every unreferenced projection
        // and EliminateSorts drops the final ORDER BY, so narrow
        // compute-only queries (the q_f_* batteries, scrub/score
        // columns) were being timed as little more than a scan. The
        // noop sink consumes every output column (and keeps the sort),
        // so the measured time is the full plan a downstream writer
        // would pay — the honest number.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          // A query that throws must be FLAGGED, not recorded as a
          // near-zero time that quietly deflates the committed totals
          // (ADVICE r9 #4): the error surfaces on stderr once and the
          // query lands in the artifacts' "errors" list.
          if (!failed)
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed = true
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // No clearCache: operators release their own caches
        // (Dedup.materializeThenRelease), spec-enforced. Checkpoint
        // blocks ARE freed here (outside the timed window): the consumed
        // result is dead, and leaving the blocks to GC lets block-manager
        // pressure build across the suite's ~500 executions — round 5
        // measured later runs of the same query 3× slower than the first.
        operators.Lifecycle.releaseAll()
        dt
      }
      (name, times.sorted.apply(runs / 2), times.head, times.min, failed)
    }
    def r3(d: Double) = math.round(d * 1000) / 1000.0
    def jmap(rs: Seq[(String, Double, Double, Double, Boolean)],
             f: ((String, Double, Double, Double, Boolean)) => Double) =
      rs.map { r => "\"" + r._1 + "\":" + r3(f(r)) }.mkString("{", ",", "}")
    // Queries whose noop write threw in ANY run: their recorded times
    // are wall-clock-to-failure, not work done — consumers must treat
    // the run as unmeasured (the errors list is the flag; JSON has no
    // Infinity literal to poison the number with).
    val errors = results.filter(_._5).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The driver captures only the TAIL of the bench log, so the stdout
    // line must stay well under ~2 KB or it truncates mid-JSON and the
    // driver records parsed:null (happened in r4 with all 98 queries ×
    // two maps at full double precision). Headline = the 24 slowest
    // medians (the ones a reader would ask about); every query's
    // median + first-run goes to BENCH_FULL.json, committed in-repo.
    val headline = results.sortBy(-_._2).take(24).sortBy(_._1)
    // queries_min is the stall-resistant number: this host has random
    // multi-second stalls that hit 1-2 arbitrary queries per full run,
    // inflating their MEDIAN of 3; the min across runs survives any
    // single stall, so a driver artifact whose medians disagree wildly
    // with its own mins self-identifies host contention (total_min
    // likewise — compare it to "value" before reading per-query deltas).
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,""" +
        s""""n_queries":${results.size},"errors":$errors,""" +
        s""""total_min":${r3(results.map(_._4).sum)},""" +
        s""""queries":${jmap(results, _._2)},""" +
        s""""queries_first":${jmap(results, _._3)},""" +
        s""""queries_min":${jmap(results, _._4)},"sf":"$sfDir"}"""
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
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","runs":$runs,""" +
      s""""n_queries":${results.size},"errors":$errors,""" +
      s""""queries":${jmap(headline, _._2)},""" +
      s""""sf":"$sfDir",$fullRef}""")
  }
}
