package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Distributed graph analytics over edge-list DataFrames.
  *
  * Connected components live in [[Dedup.duplicateClusters]] (they ARE
  * the dedup-cluster resolution); this object holds the rank/centrality
  * side. Everything is plain DataFrame algebra — an iteration is one
  * key-equi join plus one map-side-combining aggregate, the same shape
  * as [[Similarity.kmeansClusters]]' Lloyd rounds, so a 1000-executor
  * cluster runs each round as a single hash-partitioned shuffle with no
  * driver-side state beyond the loop counter.
  */
object Graph {

  /** PageRank over an UNDIRECTED edge list (the list is symmetrized and
    * deduplicated, so every node has out-degree ≥ 1 and the dangling-
    * node correction vanishes). Deterministic across engines and
    * partitionings: per-edge contributions pr/deg are single IEEE
    * divisions, their in-sum is DECIMAL(18,6)-exact ([[Num.dsum]]), and
    * each iteration's rank is rounded to 6 — so the whole trajectory is
    * replayable in SQL literal-for-literal. Scale: state is one
    * (node, pr) row per node; an iteration shuffles the edge list once
    * on src and once on dst — linear in |E| per round, the canonical
    * distributed PageRank shape. */
  def pageRank(edges: DataFrame, damping: Double, iters: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // Pre-join the degree onto every edge ONCE and cache the result
    // hash-partitioned on `src`: each iteration then joins only the
    // node-sized rank vector against an already-partitioned edge list —
    // the per-round shuffle is O(nodes) + the contribution aggregation,
    // not a re-shuffle of the full edge list (round-5 full-suite bench:
    // 13.5 s → the edge list was exchanged twice per round).
    val undDeg = und.join(deg, Seq("src"))
      .select(col("src"), col("dst"), col("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = broadcast(deg.agg(count(lit(1)).cast("long").as("n_nodes")))
    var pr = deg.select(col("src").as("node")).crossJoin(n1)
      .select(col("node"), round(lit(1.0) / col("n_nodes"), 6).as("pr"))
    for (i <- 0 until iters) {
      val contrib = undDeg
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
      // Scale-18 sum: at large node counts the per-edge contributions
      // pr/deg fall below 1e-6, where a scale-6 cast quantizes to
      // zero-or-tie and the engines' rounding modes diverge (measured:
      // 588/16k rows off by 1e-6 at sf0.1). See Num.dsumAt.
      val next = contrib.groupBy("node")
        .agg(Num.dsumAt(col("c"), 18).as("in_sum"))
        .crossJoin(n1)
        .select(col("node"),
          round(lit(1 - damping) / col("n_nodes")
            + lit(damping) * col("in_sum"), 6).as("pr"))
      // Checkpoint each round's rank vector and free round N−1's blocks:
      // the plan stays one-round deep (no re-execution of earlier rounds
      // by later consumers) and live checkpoint state is O(1).
      pr = Lifecycle.step(next, if (i == 0) None else Some(pr))
    }
    val out = pr.join(deg.withColumnRenamed("src", "node"), Seq("node"))
      .select(col("node"), col("deg"), col("pr"))
    Dedup.materializeThenRelease(out, und, undDeg)
  }

  /** The customer↔supplier trade graph implied by the warehouse schema:
    * an edge for every (customer, supplier) pair that shares at least
    * one order line. Prefixed node labels keep the two key spaces
    * disjoint. */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
}
