package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerGroupExec

/** The custom whole-operator path (TopKPerGroupRewrite + Strategy +
  * Exec, injected via GraftExtensions): the row_number-then-filter idiom
  * must PLAN through TopKPerGroupExec (no WindowExec), produce exactly
  * the rows the window formulation would, and leave non-top-k window
  * shapes untouched. */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("a", 3.0, 1L), ("a", 1.0, 2L), ("a", 2.0, 3L), ("a", 2.0, 4L),
    ("b", 9.0, 5L), ("b", 8.0, 6L),
    ("c", 5.0, 7L)
  ).toDF("g", "s", "id")

  private val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)

  test("rn <= k plans as TopKPerGroupExec, no WindowExec, exact rows") {
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val plan = q.queryExecution.sparkPlan
    assert(plan.collect { case e: TopKPerGroupExec => e }.nonEmpty, plan.toString)
    assert(!plan.toString.contains("Window"), plan.toString)
    val rows = q.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getLong(2), r.getInt(3))).toSet
    assert(rows == Set(
      ("a", 3.0, 1L, 1), ("a", 2.0, 3L, 2),
      ("b", 9.0, 5L, 1), ("b", 8.0, 6L, 2),
      ("c", 5.0, 7L, 1)))
  }

  test("rn === 1 (argmax idiom) and cast-to-long rank both rewrite") {
    val top1 = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(top1.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.nonEmpty)
    assert(top1.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 5L, 7L))

    val casted = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 1)
    assert(casted.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.nonEmpty)
    assert(casted.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 5L, 7L))
  }

  test("extra conjuncts survive as a residual filter above the top-k") {
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("s") > 2.0)
    assert(q.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.nonEmpty)
    assert(q.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 5L, 6L, 7L))
  }

  test("rank RANGES and non-row_number windows are NOT rewritten") {
    // pagination: rn in [2, 3] must keep the window (rows 2..k ≠ top-k)
    val page = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 2 && col("rn") <= 3)
    assert(page.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.isEmpty)
    assert(page.select("id").collect().map(_.getLong(0)).toSet == Set(3L, 4L, 6L))

    // rank() has gap semantics row_number lacks — left alone
    val rk = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    assert(rk.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.isEmpty)
  }

  test("float/double partition keys keep the WindowExec path") {
    // 0.0 vs -0.0 / NaN bit patterns need NormalizeFloatingNumbers,
    // which runs after the rewrite batch and doesn't know our node —
    // the rewrite must decline these windows.
    val fdf = Seq((0.0, 1L), (-0.0, 2L), (2.0, 3L)).toDF("g", "id")
    val wf = Window.partitionBy("g").orderBy("id")
    val q = fdf.withColumn("rn", row_number().over(wf)).filter(col("rn") <= 1)
    assert(q.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.isEmpty)
    // 0.0 and -0.0 are ONE group under window semantics
    assert(q.count() == 2)
  }

  test("matches the window formulation on real data (q_x_window_rank shape)") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val ww = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id").asc)
    val q = events.withColumn("rn", row_number().over(ww)).filter(col("rn") <= 5)
      .select("event_type", "rn", "event_id")
    assert(q.queryExecution.sparkPlan
      .collect { case e: TopKPerGroupExec => e }.nonEmpty)
    // independently computed expectation: sort each type's events
    val expected = events.select("event_type", "value", "event_id").collect()
      .groupBy(_.getString(0))
      .toSeq.flatMap { case (t, rows) =>
        rows.sortBy(r => (-r.getDouble(1), r.getLong(2))).take(5).zipWithIndex
          .map { case (r, i) => (t, i + 1, r.getLong(2)) }.toSeq
      }.toSet
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
  }
}
