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
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

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
