package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's text-sanitization chain, re-expressed as codegen'd
  * `Column` expressions (no UDFs — stays inside whole-stage codegen).
  *
  * Reference (SURVEY.md §2.8):
  *  - F1 delimiter escaping: `04_Airflow_Dag/thehoxtontrend_full_pipeline_final.py:322-323, 447-448`
  *  - F2 non-ASCII strip:    `…final.py:326-328, 451-453`
  *  - F3 control-char strip: `…final.py:327, 329, 452, 454` — the reference
  *    applies TWO patterns: literal backslash escape sequences (`\\t`) AND
  *    real control characters.
  *  - F5 day truncation:     `…final.py:185-186, 310-311`
  */
object Cleaning {

  /** F1 — protect the `;` CSV delimiter by rewriting it to `,`. */
  def escapeDelimiter(c: Column): Column = regexp_replace(c, ";", ",")

  /** F2 — ASCII-only: drop every non-ASCII code point (emoji etc.). */
  def stripNonAscii(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** F3 — strip literal `\t`/`\n`/`\r` escape sequences AND real
    * tab/newline/CR characters (both patterns, like the reference). */
  def stripControl(c: Column): Column =
    regexp_replace(c, "\\\\t|\\\\n|\\\\r|[\\t\\n\\r]", "")

  /** F1∘F2∘F3 in reference order. Idempotent (see CleaningSpec). */
  def cleanChain(c: Column): Column =
    stripControl(stripNonAscii(escapeDelimiter(c)))

  /** F5 — timestamp → day-truncated `yyyy/MM/dd` string
    * (`strptime("%Y-%m-%dT%H:%M:%SZ") → strftime('%Y/%m/%d')`). */
  def dayString(ts: Column): Column = date_format(ts, "yyyy/MM/dd")

  /** S7 — the Google-Analytics `dd/MM/yyyy` date shape
    * (`03_Google_Analytics_Tables/Google_Analytics_Table.csv`). */
  def gaDayString(ts: Column): Column = date_format(ts, "dd/MM/yyyy")

  /** Parse a GA-shaped `dd/MM/yyyy` string back to a DateType. */
  def parseGaDay(c: Column): Column = to_date(c, "dd/MM/yyyy")
}
