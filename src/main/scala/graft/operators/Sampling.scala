package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling for training-data curation. `sample()`'s RNG
  * is partition-placement-dependent, so a repartition changes the
  * sample; these are content-keyed instead — the same row survives on
  * every run, every engine, every partitioning (and the DuckDB oracle
  * replays the identical md5 arithmetic).
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic score for a row id: md5-derived
    * integer divided by the [[Hashing.M]] modulus. */
  def uniformOf(idCol: Column): Column =
    Hashing.md5Mod(idCol.cast("string")) / lit(Hashing.M.toDouble)

  /** The DuckDB spelling of [[uniformOf]]. */
  def uniformSql(e: String): String =
    s"(${Hashing.md5ModSql(s"CAST($e AS VARCHAR)")} / ${Hashing.M}.0)"

  /** Stratified Bernoulli sample: a row survives iff
    * `uniform(id) < rate(stratum)` — per-stratum rates with a default,
    * the data-mixing knob of a corpus pipeline (e.g. downsample
    * over-represented languages). Pure filter: no shuffle, no state,
    * linear in the scan at any scale. */
  def stratified(df: DataFrame, idCol: Column, stratumCol: Column,
                 rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) { case (acc, (k, v)) =>
      when(stratumCol === k, lit(v)).otherwise(acc)
    }
    df.filter(uniformOf(idCol) < rate)
  }

  /** Weighted domain mixing: replicate each row `floor(w)` times plus a
    * deterministic Bernoulli(frac(w)) extra copy, where `w` is its
    * domain's mix weight — the up/down-sampling step that turns raw
    * source proportions into a target training mixture (w = 0 excludes a
    * domain; w = 2.5 emits 2 or 3 copies). The fractional coin is the
    * same md5-uniform as [[stratified]], so the mixture is reproducible
    * on any engine and any partitioning. One generator per row, no
    * shuffle — output is Σ wᵢ·|domainᵢ| regardless of parallelism. */
  def weightedMix(df: DataFrame, idCol: Column, domainCol: Column,
                  weights: Seq[(String, Double)], defaultW: Double): DataFrame = {
    val w = weights.foldLeft(lit(defaultW): Column) { case (acc, (k, v)) =>
      when(domainCol === k, lit(v)).otherwise(acc)
    }
    val copies = (floor(w) +
      when(uniformOf(idCol) < w - floor(w), lit(1L)).otherwise(lit(0L))).cast("long")
    df.withColumn("n_copies", copies)
      .withColumn("copy_no", explode(
        when(col("n_copies") > 0, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))))
      .drop("n_copies")
  }
}
