package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ingest surface (SURVEY.md §2.1 S1–S5) re-expressed
  * sandbox-side: the YouTube API is unreachable, so the *same nested
  * page shape* (`{items: [{id, snippet}], nextPageToken}`) is built from
  * the test tables, written as JSON, and read back through the real
  * `spark.read.json` + explode + dot-path flatten path. The flattening
  * code is exactly what a live paginated-REST source would feed.
  */
object JsonFixtureSource {

  /** S1-shaped pages: orders become "videos" — pages of 50 items, each
    * item `{id: {videoId}, snippet: {publishedAt, title, description}}`,
    * with a nextPageToken on every non-final page. */
  def writeSearchPages(spark: SparkSession, orders: DataFrame, path: String): Unit = {
    val items = orders.select(
      (col("o_orderkey") / 50).cast("long").as("page"),
      struct(
        struct(col("o_orderkey").cast("string").as("videoId")).as("id"),
        struct(
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("publishedAt"),
          col("o_orderpriority").as("title"),
          col("o_orderstatus").as("description")).as("snippet")).as("item"))
    val pages = items
      .groupBy("page")
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .withColumn("nextPageToken",
        when(col("page") < max(col("page")).over(), concat(lit("tok_"), col("page") + 1)))
    pages.select("items", "nextPageToken")
      .write.mode("overwrite").json(path)
  }

  /** S1/P1/J2/F5 — read the pages back and flatten to one row per video
    * with the reference's null-safe dot-path projection and day
    * truncation. */
  def readAndFlattenSearch(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
      .select(explode(col("items")).as("item"))
      .select(
        col("item.id.videoId").as("video_id"),
        date_format(to_timestamp(col("item.snippet.publishedAt"),
          "yyyy-MM-dd'T'HH:mm:ss'Z'"), "yyyy/MM/dd").as("date"),
        coalesce(col("item.snippet.title"), lit("")).as("video_title"),
        coalesce(col("item.snippet.description"), lit("")).as("video_description"))

  /** S5 — whole-object text read (the reference reads its API key this
    * way): write one value per line, read with spark.read.text. */
  def writeTextObject(df: DataFrame, textCol: String, path: String): Unit =
    df.select(col(textCol)).write.mode("overwrite").text(path)

  def readTextObject(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
