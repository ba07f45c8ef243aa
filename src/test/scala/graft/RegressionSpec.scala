package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RmseAggregator
import graft.operators.Regression

/** OLS semantics against hand-computed values (the reference's
  * from-scratch math, lambda_function_final.py:53-84: population
  * slope/intercept — the missing 1/n cancels). */
class RegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val xy = Seq((1.0, 2.0), (2.0, 4.5), (3.0, 6.0)).toDF("x", "y")

  test("fit matches hand-computed slope/intercept") {
    val r = Regression.fit(xy, "x", "y").collect().head
    assert(r.getDouble(r.fieldIndex("b1")) == 2.0)
    assert(math.abs(r.getDouble(r.fieldIndex("b0")) - 1.0 / 6.0) < 1e-5)
    assert(r.getLong(r.fieldIndex("n")) == 3L)
  }

  test("RMSE Aggregator matches closed form") {
    val df = Seq((1.0, 2.0), (3.0, 3.0), (5.0, 1.0)).toDF("pred", "actual")
    val rmse = udaf(RmseAggregator)
    val viaUdaf = df.agg(rmse(col("pred"), col("actual")))
      .collect().head.getDouble(0)
    val expected = math.sqrt((1.0 + 0.0 + 16.0) / 3.0)
    assert(math.abs(viaUdaf - expected) < 1e-12)
  }

  test("modulo split is a deterministic 60/40 partition") {
    val keys = (0L until 1000L).toDF("k")
    val train = keys.filter(Regression.isTrain(col("k"))).count()
    assert(train == 600L)
  }

  test("K5 envelope: status/header/deterministic JSON body") {
    val results = Seq((12.25, 0.5, -3.125)).toDF("rmse", "b0", "b1")
    val r = Regression.responseEnvelope(results).collect().head
    assert(r.getLong(r.fieldIndex("status_code")) == 200L)
    assert(r.getString(r.fieldIndex("content_type")) == "application/json")
    // fixed-scale decimal rendering, reference key order (RMSE, then
    // [b0, b1] — lambda_function_final.py:96-98)
    assert(r.getString(r.fieldIndex("body")) ==
      """{"RMSE": [12.250000], "Model Coefficients": [0.500000, -3.125000]}""")
  }

  test("row order does not change the fit (permutation invariance)") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val a = Regression.fit(li, "l_quantity", "l_extendedprice").collect().head
    val b = Regression.fit(li.orderBy(rand(11)), "l_quantity", "l_extendedprice")
      .collect().head
    assert(a.getDouble(0) == b.getDouble(0) && a.getDouble(1) == b.getDouble(1))
  }
}
