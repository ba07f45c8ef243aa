package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** The Misra–Gries theorems the q_text_heavy_hitters half-gate leans on,
  * checked directly against exact counts on adversarial streams and
  * arbitrary partition/merge shapes.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def exact(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Run the aggregator the way Spark would: split into partitions,
    * fold each with reduce, then merge the partials left-to-right. */
  private def run(mg: MisraGries, parts: Seq[Seq[String]]): Map[String, Long] =
    parts.map(_.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)

  private def checkBounds(stream: Seq[String], k: Int,
                          parts: Seq[Seq[String]]): Unit = {
    val mg = new MisraGries(k)
    val est = run(mg, parts)
    val truth = exact(stream)
    val n = stream.size.toLong
    assert(est.size <= k, s"summary exceeded $k counters: ${est.size}")
    est.foreach { case (w, e) =>
      assert(e <= truth(w), s"overcount on $w: est $e > true ${truth(w)}")
    }
    truth.foreach { case (w, t) =>
      val e = est.getOrElse(w, 0L)
      assert(t - e <= 2.0 * n / k,
        s"undercount bound broken on $w: true $t, est $e, n $n, k $k")
    }
  }

  test("zipf-ish stream: bounds hold and every heavy item is present") {
    val rnd = new scala.util.Random(7)
    // item i drawn with weight ~ 1/(i+1): a genuine heavy head
    val pool = (0 until 500).flatMap(i => Seq.fill(500 / (i + 1) + 1)(s"w$i"))
    val stream = Seq.fill(20000)(pool(rnd.nextInt(pool.size)))
    val k = 50
    checkBounds(stream, k, stream.grouped(700).toSeq)
    val mg = new MisraGries(k)
    val est = run(mg, stream.grouped(700).toSeq)
    val n = stream.size.toLong
    exact(stream).foreach { case (w, t) =>
      if (t > 2.0 * n / k)
        assert(est.contains(w), s"heavy item $w (count $t) missing")
    }
  }

  test("bounds are partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val stream = Seq.fill(5000)(s"v${rnd.nextInt(800)}")
    for (chunk <- Seq(1, 13, 500, 5000))
      checkBounds(stream, 40, stream.grouped(chunk).toSeq)
    // reversed merge order too
    val mg = new MisraGries(40)
    val parts = stream.grouped(13).toSeq.reverse
    checkBounds(stream.reverse, 40, parts)
  }

  test("domain smaller than k degenerates to exact counting") {
    val stream = Seq.fill(300)("a") ++ Seq.fill(200)("b") ++ Seq.fill(7)("c")
    val mg = new MisraGries(10)
    val est = run(mg, stream.grouped(17).toSeq)
    assert(est == Map("a" -> 300L, "b" -> 200L, "c" -> 7L))
  }
}
