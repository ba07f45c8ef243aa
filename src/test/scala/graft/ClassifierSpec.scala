package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("logisticFit separates a clean-margin synthetic set") {
    // y = 1 iff x1 > 0 with a wide margin; x2 is uninformative noise,
    // x3 is corpus-constant (std 0 → the degenerate z = 0 guard runs).
    val feats = (1 to 200).map { i =>
      val x1 = if (i % 2 == 0) 2.0 + (i % 7) else -2.0 - (i % 5)
      (i.toLong, x1, (i % 3).toDouble, 5.0, if (x1 > 0) 1.0 else 0.0)
    }.toDF("doc_id", "x1", "x2", "x3", "y")
    val r = Classifier.logisticFit(feats, 4, 0.001).collect().head
    assert(r.getAs[Long]("n_docs") == 200L)
    assert(r.getAs[Double]("accuracy") >= 0.99,
      s"separable set must classify cleanly, got ${r.getAs[Double]("accuracy")}")
    assert(r.getAs[Double]("b1") > 0, "weight on the separating feature")
  }

  test("logisticFit is repartition-stable (decimal IRLS trajectory)") {
    val base = (1 to 120).map(i =>
      (i.toLong, (i % 13).toDouble, (i % 7).toDouble, (i % 3).toDouble,
        (if (i % 13 > 6) 1.0 else 0.0)))
      .toDF("doc_id", "x1", "x2", "x3", "y")
    val a = Classifier.logisticFit(base, 3, 0.001).collect().head
    val b = Classifier.logisticFit(base.repartition(7), 3, 0.001).collect().head
    assert(a == b, "coefficients and metrics must be bit-identical " +
      "under repartitioning — every sum is decimal-exact")
  }

  test("ridge keeps coefficients bounded on separable data") {
    // The Gopher rule is deterministic in its features, so the training
    // set is separable: an UNPENALIZED MLE would diverge (|β| grows
    // without bound with more Newton rounds). The ridge score equation
    // Xᵀ(y−p) = λβ has a finite optimum, so extra rounds past
    // convergence must leave β (to the round-6 trajectory's precision)
    // essentially unchanged, not larger.
    val feats = (1 to 200).map { i =>
      val x1 = if (i % 2 == 0) 2.0 + (i % 7) else -2.0 - (i % 5)
      (i.toLong, x1, (i % 3).toDouble, (i % 4).toDouble,
        if (x1 > 0) 1.0 else 0.0)
    }.toDF("doc_id", "x1", "x2", "x3", "y")
    val lambda = 1.0
    val a = Classifier.logisticFit(feats, 8, lambda).collect().head
    val b = Classifier.logisticFit(feats, 12, lambda).collect().head
    for (j <- 0 until 4) {
      val d = math.abs(a.getAs[Double](s"b$j") - b.getAs[Double](s"b$j"))
      assert(d < 0.01,
        s"b$j moved $d between round 8 and 12 — not converged (divergent MLE?)")
    }
    assert(b.getAs[Double]("accuracy") >= 0.99)
  }

  test("deltaExprs is a valid solve: recovers delta for a known system") {
    // With M = I (weight diagonals 1 − λ so the ridge lands on exactly
    // 1; the intercept m00 is unpenalized so it's 1 directly), β = 0
    // (so the gradient penalty −λβ vanishes) and gradient g, Cramer
    // must return δ = g.
    val lambda = 0.001
    val exprs = Classifier.deltaExprs(lambda)
    val row = spark.range(1).selectExpr(
      (for (r <- 0 until 4; c <- r until 4)
        yield s"CAST(${if (r == c) (if (r == 0) 1.0 else 1.0 - lambda)
          else 0.0} AS DOUBLE) AS m$r$c") ++
      (0 until 4).map(j => s"CAST(${j + 1}.5 AS DOUBLE) AS g$j") ++
      (0 until 4).map(j => s"CAST(0.0 AS DOUBLE) AS b$j"): _*)
    val out = row.selectExpr(
      (0 until 4).map(i => s"${exprs(i)} AS d$i"): _*).collect().head
    for (i <- 0 until 4)
      assert(math.abs(out.getAs[Double](s"d$i") - (i + 1.5)) < 1e-12)
  }

  test("thresholdSweep: confusion rows are consistent and recall is monotone") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = Classifier.thresholdSweep(docs, 4, 0.001, (1 to 9).map(_ / 10.0))
      .orderBy("thr").collect()
    assert(rows.length == 9)
    val n = docs.count()
    // every row partitions the corpus: tp+fp+fn+tn == |docs|
    rows.foreach { r =>
      val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn")
      assert(total == n, s"thr=${r.getAs[Double]("thr")}: $total != $n")
    }
    // positives tp+fn are threshold-independent (the label never moves)
    assert(rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct.length == 1)
    // raising the threshold can only shrink the predicted-positive set
    val preds = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp"))
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b })
    val recalls = rows.map(_.getAs[Double]("rec"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    // f1 matches its rounded-inputs definition
    rows.foreach { r =>
      val (p0, r0) = (r.getAs[Double]("prec"), r.getAs[Double]("rec"))
      val want = if (p0 + r0 == 0.0) 0.0
        else BigDecimal(2.0 * p0 * r0 / (p0 + r0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("f1") == want)
    }
  }
}
