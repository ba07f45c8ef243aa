package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain packs under `graft.packs`:
  *  - [[packs.RefOps]]      — the reference's own operator inventory (§2)
  *  - [[packs.Warehouse]]   — the `x_` analytical superset the warehouse
  *                            schema implies (joins/group-bys/windows, §2.13)
  *  - [[packs.DataPipeline]]— LLM-training-data ops (dedup/similarity/
  *                            text analysis/multimodal)
  *  - [[packs.Sinks]]       — source/sink round trips (CSV/JSON/catalog)
  *
  * Every query takes `(spark, sfDir)` and returns a deterministic,
  * totally-ordered DataFrame whose schema (names + long/double/string
  * normalization) matches its DuckDB oracle exactly.
  */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline question: fit "views → comments" OLS on the
    * full table (lambda_function_final.py:92) — here over lineitem
    * quantity → extendedprice. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_m3_regression_fit")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    packs.RefOps.queries ++ packs.WarehousePack.queries ++
      packs.PipelinePack.queries ++ packs.SinksPack.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used only for ops DuckDB cannot express). */
  def oracleSql: Map[String, String] =
    packs.RefOps.oracles ++ packs.WarehousePack.oracles ++
      packs.PipelinePack.oracles ++ packs.SinksPack.oracles
}
