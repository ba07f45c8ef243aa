package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Cleaning, Num}
import graft.sources.JsonFixtureSource

/** The reference's five-stage DAG (SURVEY.md §3.1) composed end-to-end
  * over local paths — scrape-fixture → transform/clean → `;`-CSV sink →
  * warehouse tables → regression — with Spark idioms at every boundary:
  * JSON fixture pages for the API, parquet-free CSV interchange exactly
  * where the reference used S3, `saveAsTable` where it used Postgres,
  * and a distributed OLS fit where it used a Lambda.
  *
  * Role mapping (FIXTURES.md §B): orders = videos, lineitem = comments,
  * per-order aggregates = video_statistics (x = total quantity ≈ views,
  * y = item count ≈ comment count).
  */
object Pipeline {

  private def stagePath(workDir: String, stage: String): String = s"$workDir/$stage"

  /** Stage 1+2 — ingest the nested JSON fixture and flatten+clean. */
  def scrapeAndClean(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    JsonFixtureSource.writeSearchPages(
      spark, Tables.orders(spark, sfDir), stagePath(workDir, "pages"))
    JsonFixtureSource.readAndFlattenSearch(spark, stagePath(workDir, "pages"))
      .withColumn("video_title", Cleaning.cleanChain(col("video_title")))
      .withColumn("video_description", Cleaning.cleanChain(col("video_description")))
  }

  /** Stage 2 — per-video statistics from the comment-shaped fact table. */
  def statistics(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").cast("string").as("video_id"))
      .agg(
        Num.dsum(col("l_quantity")).as("views"),
        count(lit(1)).as("comments"))

  /** Stage 3 — land both tables as `;`-CSV (K1) and read back (S6). */
  def throughCsv(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite")
      .option("sep", ";").option("header", "true").csv(path)
    spark.read
      .option("sep", ";").option("header", "true").option("multiLine", "true")
      .schema(df.schema) // explicit schema: CSV carries no types (K3's DDL role)
      .csv(path)
  }

  /** Stage 5 — the serving query: OLS comments ~ views over the
    * warehouse statistics table (M3), one row out. */
  def regression(stats: DataFrame): DataFrame =
    stats.agg(
      round(regr_slope(col("comments"), col("views")), 6).as("b1"),
      round(regr_intercept(col("comments"), col("views")), 6).as("b0"),
      count(lit(1)).as("n_videos"),
      round(avg(col("views")), 6).as("avg_views"))

  /** All five stages; returns the 1-row serving result. The descriptions
    * branch goes through the same CSV sink and a catalog table to mirror
    * the DAG's store step (K2/K3). */
  def run(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    val descriptions = scrapeAndClean(spark, sfDir, workDir)
    val descBack = throughCsv(spark, descriptions, stagePath(workDir, "csv_descriptions"))
    descBack.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_pipeline_descriptions")

    val stats = statistics(spark, sfDir)
    val statsBack = throughCsv(spark, stats, stagePath(workDir, "csv_statistics"))
    statsBack.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_pipeline_statistics")

    // The serving fit reads from the warehouse, like the Lambda read S3.
    val joined = spark.table("graft_pipeline_statistics")
      .join(spark.table("graft_pipeline_descriptions"), Seq("video_id"), "inner")
    regression(joined.select(col("views"), col("comments")))
  }
}
