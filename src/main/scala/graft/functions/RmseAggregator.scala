package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A5 as a typed `Aggregator` (the UDAF surface from SURVEY.md §2.12):
  * RMSE of (prediction, actual) pairs. Partial (sumSq, n) buffers merge
  * associatively across partitions — the same map-side-combine shape as
  * any built-in aggregate, so it distributes without driver math.
  * Reference: lambda_function_final.py:31-38.
  */
object RmseAggregator extends Aggregator[(Double, Double), (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), in: (Double, Double)): (Double, Long) = {
    val r = in._1 - in._2
    (b._1 + r * r, b._2 + 1L)
  }

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.sqrt(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
    Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
