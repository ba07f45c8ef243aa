package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary: at most `k` counters of constant
  * size, mergeable across partitions (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) — the bounded-memory alternative to a full
  * `groupBy(item).count()` when the item domain is unbounded (URLs,
  * n-grams, user agents) but only the heavy tail matters.
  *
  * Guarantees (for stream length n, buffer size k):
  *  - never overcounts: est(x) ≤ true(x) for every item;
  *  - bounded undercount: true(x) − est(x) ≤ 2n/k — n/k from the
  *    reduce-phase decrements (each decrement event of size m removes
  *    ≥ k·m + 1 occurrences of stored+incoming mass, so Σm ≤ n/k) plus
  *    n/(k+1) from the merge-phase (k+1)-th-largest cut (the mergeable-
  *    summaries argument), ≤ 2n/k together.
  *  Hence every item with true count > 2n/k is present in the summary,
  *  whatever the partitioning or merge order.
  *
  * The reduce step uses the min-subtraction variant: when the buffer is
  * full and an unseen item arrives, ALL counters drop by the current
  * minimum (instead of by 1), evicting every minimum-count entry at
  * once — same bound, and far fewer O(k) rebuild passes on uniform
  * tails than decrement-by-1.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "Misra-Gries needs at least 2 counters")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        val m = b.valuesIterator.min
        b.collect { case (w, c) if c > m => w -> (c - m) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val merged = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
    if (merged.size <= k) merged
    else {
      // keep the k largest, shifted down by the (k+1)-th largest count
      val cut = merged.valuesIterator.toIndexedSeq
        .sorted(Ordering[Long].reverse)(k)
      merged.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
