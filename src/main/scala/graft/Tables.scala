package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table under `\$sfDir`. All queries read through
  * here so the scan path (schema pruning, filter pushdown) is uniform:
  * Catalyst pushes `select`/`filter` into these parquet scans, which is
  * the scale story — at 100 TB the scan must only read the referenced
  * columns and row groups.
  */
object Tables {
  import org.apache.spark.sql.functions.{expr, timestamp_micros}
  import org.apache.spark.sql.types.LongType

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** All graft sessions must read nanosecond parquet timestamps
    * (events.ts) as raw longs instead of erroring (PARQUET_TYPE_ILLEGAL);
    * [[events]] then rescales to a proper µs TimestampType. Applied by
    * Verify/Bench/test builders via this helper. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet; Spark's TimestampType is µs.
    * With nanosAsLong=true the scan yields LongType nanos — rescale with
    * integer division (exact; a double path would lose precision at
    * 1e18 ns) to µs and rebuild the timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
