package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k of (score, id) pairs per group — score DESC, id ASC —
  * as a typed `Aggregator`, replacing the row_number-over-window shape
  * for top-k ranking. The window form shuffles the FULL scored set per
  * group before discarding all but k rows; this aggregator keeps at most
  * `4k` candidates in each partial buffer, so only O(k) rows per group
  * per partition ever cross the shuffle — the difference between moving
  * |corpus| rows and moving k at 100 TB.
  *
  * The buffer is trimmed lazily (only when it exceeds 4k) so the common
  * append path is O(1) and sorting amortizes to O(n log k / k) per
  * element. Dropped entries can never re-enter the true top-k, so
  * trim-to-k at any point is lossless.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // Strict total order: score desc, then id asc (the same tiebreak the
  // oracle's ROW_NUMBER ... ORDER BY score DESC, id ASC applies).
  // java.lang.Double.compare keeps the order total when a NaN score
  // appears (zero-norm vector: 0/0): NaN sorts as the LARGEST value —
  // the same place DuckDB's ORDER BY ... DESC puts it — instead of
  // making sortWith's ordering non-strict via raw `>`. `+ 0.0`
  // canonicalizes -0.0 to 0.0 so the two zeros tie (as SQL comparison
  // does) rather than ordering -0.0 < 0.0 as Double.compare would.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (s.length <= 4 * k) s else s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    trim(b :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.sortWith(better).take(k)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

/** [[TopKAggregator]]'s (count, word) sibling for string-keyed ranking
  * — count DESC, word ASC, the ROW_NUMBER order of a vocabulary top-k.
  * Exact long counts, so no float-order subtleties. Same bounded-buffer
  * contract: at most `4k` candidates per partial, O(k) rows per
  * partition across the shuffle — what replaces the row_number-over-
  * lit(1)-window shape that funnels an entire vocabulary through one
  * task. */
class TopKStringAggregator(k: Int)
    extends Aggregator[(Long, String), Seq[(Long, String)], Seq[(Long, String)]] {

  private def better(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Long, String)]): Seq[(Long, String)] =
    if (s.length <= 4 * k) s else s.sortWith(better).take(k)

  override def zero: Seq[(Long, String)] = Vector.empty

  override def reduce(b: Seq[(Long, String)], in: (Long, String)): Seq[(Long, String)] =
    trim(b :+ in)

  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    trim(a ++ b)

  override def finish(b: Seq[(Long, String)]): Seq[(Long, String)] =
    b.sortWith(better).take(k)

  override def bufferEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
}

/** Bounded k-MINIMUM-values aggregator — the KMV distinct-value sketch
  * primitive: keep the k smallest 64-bit hashes seen, O(k) state per
  * partial buffer (same lazy 4k trim discipline as [[TopKAggregator]]).
  * A set's k smallest elements do not depend on arrival order or
  * partitioning, so a KMV sketch built from engine-portable hashes
  * ([[Hashing.md5Long]]) is EXACTLY reproducible by the oracle — the
  * rare sketch whose estimates can be fully hash-gated, not just
  * bounded-error gated. Feed it DISTINCT values (KMV is a sketch of a
  * set); upstream queries distinct on (group, hash) first. */
class KMinAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def trim(s: Seq[Long]): Seq[Long] =
    if (s.length <= 4 * k) s else s.sorted.take(k)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], in: Long): Seq[Long] = trim(b :+ in)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)

  override def finish(b: Seq[Long]): Seq[Long] = b.sorted.take(k)

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
