package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank on a path graph: symmetric ends tie, hub dominates, mass ≈ 1") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val pr = Graph.pageRank(edges, 0.85, 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("pr")).toMap
    assert(pr.keySet == Set("a", "b", "c"))
    // a and c see literally the same arithmetic every iteration.
    assert(pr("a") == pr("c"))
    assert(pr("b") > pr("a"))
    assert(math.abs(pr.values.sum - 1.0) < 1e-3)
  }

  test("pageRank over the trade graph is a probability-mass fixpoint, repartition-stable") {
    val edges = Graph.tradeEdges(
      Tables.orders(spark, TestSpark.sf0001), Tables.lineitem(spark, TestSpark.sf0001))
    val out = Graph.pageRank(edges, 0.85, 3).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("pr") > 0.0))
    // Undirected + no dangling nodes → total mass conserved up to the
    // per-node rounding (±5e-7 each).
    val mass = out.map(_.getAs[Double]("pr")).sum
    assert(math.abs(mass - 1.0) < 1e-6 * out.length + 1e-3)
    val again = Graph.pageRank(edges.repartition(7), 0.85, 3).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Double]("pr"))).sorted.toSeq
    assert(again == out.map(r => (r.getAs[String]("node"), r.getAs[Double]("pr"))).sorted.toSeq)
  }
}
