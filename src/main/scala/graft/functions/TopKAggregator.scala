package graft.functions


import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing per-group top-k (score, id) pairs with
  * a bounded buffer — the §2.2 UDAF surface.
  *
  * Scale rationale: the window formulation
  * (`row_number().over(partitionBy(g).orderBy(score))` + filter) must
  * shuffle and SORT every row of every group. This aggregator keeps
  * only k candidates per group in the partial buffer, so the shuffle
  * carries ≤k rows per group per map task and nothing is globally
  * sorted. At 100 TB with millions of rows per group that's the
  * difference between a sort-spill and a map-side combine.
  *
  * Ordering: descending score, ascending id as the deterministic
  * tie-break (same convention as q09).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better than"

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(lt).take(k)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
      x: (Double, Long)): List[(Double, Long)] =
    trim(x :: buf)

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith(lt)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
