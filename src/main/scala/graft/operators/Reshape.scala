package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshape / nested-data operators (SURVEY.md §2.6, §2.9, §2.10).
  *
  * The reference's pandas composition R1 (list→wide frame) + R2 (melt)
  * + P6 (dropna) + W1 (1-based ordinal) collapses to a single Spark
  * generator: `posexplode` — one narrow op, no shuffle, fully
  * distributed (reference `04_Airflow_Dag/
  * thehoxtontrend_full_pipeline_final.py:425-437`).
  */
object Reshape {

  /** R1+R2+P6+W1 — tags array → long form with 1-based ordinals.
    * Videos whose tag list was defaulted to `[""]` keep one row
    * (P5 semantics, `…final.py:415-421`): `coalesce` the array before
    * exploding, never after. */
  def unpivotWithOrdinal(df: DataFrame, id: Column, tags: Column): DataFrame =
    df.select(id.as("id"), posexplode(coalesce(tags, array(lit("")))))
      .select(
        col("id"),
        (col("pos") + 1).cast("long").as("tag_number"),
        col("col").as("tag_value"))

  /** J2/P1 — nested struct-array build + flatten round trip: group rows
    * into an array-of-structs per key (sorted for determinism), then
    * explode back out. Demonstrates the two-level `pages[].items[]`
    * flatten (`…final.py:173-178`). */
  def nestThenFlatten(df: DataFrame, key: String, fields: Seq[String]): DataFrame = {
    val nested = df
      .groupBy(col(key))
      .agg(sort_array(collect_list(struct(fields.map(col): _*))).as("items"))
    nested
      .select(col(key), explode(col("items")).as("item"))
      .select(col(key) +: fields.map(f => col(s"item.$f").as(f)): _*)
  }

  /** J3/W2 — two-level hierarchy flatten with reply flag: parents get
    * flag 0, children flag 1, unioned into one long frame
    * (`…final.py:286-303`). Both sides are narrow scans; the union is
    * plan-level only (no shuffle). */
  def hierarchyFlatten(parents: DataFrame, children: DataFrame): DataFrame =
    parents.unionByName(children)
}
