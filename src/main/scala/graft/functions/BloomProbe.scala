package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Exposes Spark's internal bloom-filter build/probe pair as SQL
  * functions.
  *
  * [[BloomFilterAggregate]] (`bloom_filter_agg`) and
  * [[BloomFilterMightContain]] (`might_contain`) are the expressions
  * Spark's own runtime row-level filtering plants on the build and
  * probe sides of large joins; neither is registered for end users.
  * Registering them makes the full build-then-probe bloom pattern
  * available to library queries: compact a huge key set into a
  * fixed-size bit array with one aggregate, then test membership on a
  * scan with no join at all. The probe's filter argument must be a
  * scalar subquery (or constant) — the expression itself enforces
  * that, which is exactly the shape that broadcasts the filter once
  * per executor.
  */
object BloomProbe {
  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "bloom_filter_agg")(
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)))
    Registry.registerOnce(spark, "might_contain")(
      exprs => BloomFilterMightContain(exprs(0), exprs(1)))
  }
}
