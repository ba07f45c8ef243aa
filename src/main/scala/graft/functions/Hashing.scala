package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing. Spark's own `hash`/`xxhash64` are
  * Spark-specific, so every hash that must agree with the DuckDB oracle
  * is derived from md5 (identical bytes on both engines) and then mapped
  * into integer domains with plain 64-bit arithmetic.
  */
object Hashing {

  /** Modulus 2^31−1. Small enough that a·h + b stays inside a signed
    * 64-bit long ((2^31)² + 2^31 < 2^63), so the exact same integer
    * arithmetic runs on any engine — no 128-bit paths needed. */
  val M: Long = 2147483647L

  /** Portable 60-bit content hash: first 15 hex chars of md5 as a long.
    * Spark: conv(hex,16,10); DuckDB: CAST('0x…' AS BIGINT). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def md5LongSql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** [[md5Long]] reduced into the MinHash permutation domain. */
  def md5Mod(c: Column): Column = md5Long(c) % M
  def md5ModSql(e: String): String = s"(${md5LongSql(e)} % $M)"

  /** Fixed MinHash permutation constants h_i(x) = (a_i·x + b_i) mod M,
    * seeded once — the oracle SQL embeds the same literals, so both
    * engines compute identical signatures. k=16 perms → 4 bands × 4 rows
    * (candidate probability ≈ 1 at jaccard .98, ≈ 2e-5 at jaccard .05,
    * matching the testdata's planted-dup separation). */
  val minhashPerms: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(16)(
      ((rnd.nextLong() & Long.MaxValue) % (M - 1) + 1,
       (rnd.nextLong() & Long.MaxValue) % M))
  }
}
