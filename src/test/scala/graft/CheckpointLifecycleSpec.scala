package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, Lifecycle, Similarity}

/** Checkpoint blocks are released deterministically, not left to GC.
  *
  * Round-5 bench evidence: `localCheckpoint` blocks accumulating across
  * ~500 query executions degraded later runs 3× (q_sim_pca_power
  * 36 s → 90+ s). Two invariants now hold:
  *
  *  1. every operator result that goes through
  *     `Dedup.materializeThenRelease` is REGISTERED, and
  *     `Lifecycle.releaseAll()` (called by Bench between timed runs and
  *     Verify between queries) drops its blocks — repeat executions
  *     cannot grow the persisted-RDD set;
  *  2. iterative fixpoints (pcaPower, kmeansClusters, pageRank,
  *     duplicateClusters) free round N−1's blocks as soon as round N
  *     materializes — live checkpoint state during a loop is O(1) in the
  *     iteration count.
  */
class CheckpointLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  /** Persisted RDD count AFTER forcing the async unpersists to land:
    * unpersist(blocking=false) removes from sc.persistentRdds via an
    * async message; poll briefly for convergence. */
  private def persistedCount(expectAtMost: Int): Int = {
    val sc = spark.sparkContext
    var n = sc.getPersistentRDDs.size
    val deadline = System.nanoTime() + 5e9.toLong
    while (n > expectAtMost && System.nanoTime() < deadline) {
      Thread.sleep(50)
      n = sc.getPersistentRDDs.size
    }
    n
  }

  test("releaseAll frees registered result blocks — repeat runs don't accumulate") {
    Lifecycle.releaseAll()
    val base = persistedCount(0)
    val emb = Tables.embeddings(spark, d)
    for (_ <- 1 to 3) {
      Similarity.pcaPower(emb, iters = 3, dim = 64).count()
      assert(Lifecycle.liveCount > 0, "pcaPower result was not registered")
      Lifecycle.releaseAll()
      assert(Lifecycle.liveCount === 0)
    }
    assert(persistedCount(base) <= base,
      "persisted RDDs grew across released repeat executions")
  }

  test("iterative operators keep live checkpoint state O(1) in rounds") {
    Lifecycle.releaseAll()
    val emb = Tables.embeddings(spark, d)
    // 8 power iterations → without per-round release this registers 8+
    // direction frames; with Lifecycle.step only the current round plus
    // the final result survive.
    Similarity.pcaPower(emb, iters = 8, dim = 64).count()
    assert(Lifecycle.liveCount <= 2,
      s"pcaPower(8 rounds) left ${Lifecycle.liveCount} live checkpoints — per-round release broken")
    Lifecycle.releaseAll()

    Similarity.kmeansClusters(emb, centStride = 40, iters = 6).count()
    assert(Lifecycle.liveCount <= 2,
      s"kmeansClusters(6 rounds) left ${Lifecycle.liveCount} live checkpoints")
    Lifecycle.releaseAll()

    val edges = Graph.tradeEdges(Tables.orders(spark, d), Tables.lineitem(spark, d))
    Graph.pageRank(edges, damping = 0.85, iters = 8).count()
    assert(Lifecycle.liveCount <= 2,
      s"pageRank(8 rounds) left ${Lifecycle.liveCount} live checkpoints")
    Lifecycle.releaseAll()
  }

  test("distributed cluster fixpoint releases per round and stays correct") {
    Lifecycle.releaseAll()
    // Chain graph 0-1-2-...-9 plus an isolated pair: forces several
    // pointer-doubling rounds through the DISTRIBUTED path
    // (smallGraphEdges=0 disables the single-task shortcut).
    import spark.implicits._
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      .union(Seq((100L, 101L)).toDF("doc_a", "doc_b"))
    val out = Dedup.duplicateClusters(pairs, maxIter = 20, smallGraphEdges = 0L)
    val labels = out.select("doc_id", "cluster_id").as[(Long, Long)]
      .collect().toMap
    assert((0L to 9L).forall(labels(_) == 0L), "chain must root at 0")
    assert(labels(100L) == 100L && labels(101L) == 100L)
    assert(Lifecycle.liveCount <= 2,
      s"duplicateClusters left ${Lifecycle.liveCount} live checkpoints")
    Lifecycle.releaseAll()
  }
}
