package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F4 — demojize: rewrite each emoji to `#*name#*` (SURVEY.md §2.8).
  *
  * Reference: `04_Airflow_Dag/thehoxtontrend_full_pipeline_final.py:180-182,
  * 305-307` — `emoji.demojize(x, delimiters=("#*", "#*"))`, commented out
  * in the final revision but with its output baked into the committed
  * golden data (`02_YouTube_API_Tables[Test_Run]/Video_Comments_Table.csv`
  * row 2: `#*OK_hand_light_skin_tone#*`, `#*grinning_face#*`).
  *
  * The mapping here is a bounded constant table (names match the Python
  * `emoji` library's aliases for these code points) compiled into a chain
  * of literal `replace` calls — pure codegen'd string ops, no UDF, no
  * regex. At full-catalog scale (~3.6k emoji) the same semantics would be
  * an explode-on-codepoint + broadcast-join against the mapping table;
  * for a bounded mapping the replace chain is the faster plan (one pass
  * per entry over in-register strings, zero joins). Multi-codepoint
  * sequences (skin-tone modifiers) are applied longest-first so
  * `OK_hand_light_skin_tone` wins over bare `OK_hand`.
  */
object Demojize {

  /** (emoji, python-emoji-library name). Bounded, shared verbatim with
    * the DuckDB oracle via [[demojizeSql]]. */
  val mapping: Seq[(String, String)] = Seq(
    "👌🏻" -> "OK_hand_light_skin_tone",
    "👍🏻" -> "thumbs_up_light_skin_tone",
    "👌" -> "OK_hand",
    "👍" -> "thumbs_up",
    "😀" -> "grinning_face",
    "😂" -> "face_with_tears_of_joy",
    "🤣" -> "rolling_on_the_floor_laughing",
    "😍" -> "smiling_face_with_heart-eyes",
    "😎" -> "smiling_face_with_sunglasses",
    "😭" -> "loudly_crying_face",
    "🙏" -> "folded_hands",
    "🔥" -> "fire",
    "🎉" -> "party_popper",
    "💯" -> "hundred_points",
    "❤️" -> "red_heart")

  /** Longest emoji first (UTF-16 length, then lexicographic for
    * determinism) so modifier sequences are consumed before their base. */
  private val ordered: Seq[(String, String)] =
    mapping.sortBy { case (em, _) => (-em.length, em) }

  /** The Spark side: a fold of literal `replace` calls. */
  def demojize(c: Column): Column =
    ordered.foldLeft(c) { case (acc, (em, name)) =>
      replace(acc, lit(em), lit(s"#*$name#*"))
    }

  /** The DuckDB mirror — same entries, same order, same delimiters. */
  def demojizeSql(e: String): String =
    ordered.foldLeft(e) { case (acc, (em, name)) =>
      s"replace($acc, '$em', '#*$name#*')"
    }
}
