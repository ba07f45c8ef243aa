package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev-only per-query cost profile (optimization guide §1): wall time
  * split into plan-build vs execute, plus job/stage/task counts, task
  * time, shuffle bytes and spill — the numbers that say whether a query
  * at bench scale is compute-bound or scheduling/shuffle-overhead-bound
  * (255 tiny-input queries: most wall time is structural, so the fix is
  * fewer jobs/stages/exchanges, not faster inner loops).
  *
  * Usage: runMain graft.Profile <sfDir> [q1,q2,...] [runs]
  * Prints one line per run per query; the FIRST run absorbs fixture
  * setup (like Bench's run 1), so read the later runs.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Verify.session("graft-profile")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val spill = new AtomicLong
    val input = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.memoryBytesSpilled)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    // JIT/codegen warmup, mirrors Bench.main
    SparkEntry.entry(spark).count()
    packs.SinksPack.prewarm(spark, sfDir)
    for (name <- names; r <- 0 until runs) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        // Count the BUILD phase's jobs too: most slow queries run their
        // eager work (fixtures, checkpoints, index builds, stream
        // drains) inside the query function, before exec starts.
        Seq(jobs, stages, tasks).foreach(_.set(0))
        Seq(taskTimeMs, shufRead, shufWrite, spill, input).foreach(_.set(0))
        val df = fn(spark, sfDir)
        org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 5000)
        val t1 = System.nanoTime()
        val buildJobs = jobs.get(); val buildStages = stages.get()
        val buildTasks = tasks.get()
        Seq(jobs, stages, tasks).foreach(_.set(0))
        Seq(taskTimeMs, shufRead, shufWrite, spill, input).foreach(_.set(0))
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        org.apache.spark.GraftListenerDrain.waitUntilEmpty(spark.sparkContext, 5000) // drain listener bus
        println(f"PROFILE $name%-34s run$r build=${(t1 - t0) / 1e9}%6.2f s " +
          f"bJobs=$buildJobs%3d bStages=$buildStages%4d bTasks=$buildTasks%5d " +
          f"exec=${(t2 - t1) / 1e9}%6.2f s jobs=${jobs.get()}%3d " +
          f"stages=${stages.get()}%4d tasks=${tasks.get()}%5d " +
          f"taskTime=${taskTimeMs.get() / 1000.0}%7.1f s " +
          f"shufR=${shufRead.get() / 1048576.0}%7.1f MB " +
          f"shufW=${shufWrite.get() / 1048576.0}%7.1f MB " +
          f"spill=${spill.get() / 1048576.0}%6.1f MB " +
          f"input=${input.get() / 1048576.0}%7.1f MB")
      } catch {
        // NonFatal: a fatal JVM error (OOM, InterruptedException) must
        // abort the tool, not be recorded as a per-query failure.
        case scala.util.control.NonFatal(e) =>
          println(s"PROFILE $name run$r FAILED: ${e.getMessage}")
      }
      operators.Lifecycle.releaseAll()
    }
    spark.stop()
  }
}
