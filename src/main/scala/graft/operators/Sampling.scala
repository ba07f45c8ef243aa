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
}
