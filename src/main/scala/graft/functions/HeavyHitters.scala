package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch state: at most `k` counters plus
  * the total row count the sketch has absorbed.
  */
final case class MGSketch(counters: Map[String, Long], n: Long)

/** Mergeable Misra-Gries heavy-hitters sketch as a typed `Aggregator`
  * — the third member of the sketch family (q58 HLL distinct, q59 GK
  * percentiles): approximate frequent items in one pass with O(k)
  * state.
  *
  * Scale rationale: exact top-k over 100 TB needs a full groupBy
  * shuffle of every key occurrence; the MG sketch folds each
  * partition into ≤ k counters, the shuffle carries ONLY the
  * counter maps, and `merge` combines them without revisiting rows
  * (classic mergeable-summaries construction: sum counters, then
  * subtract the (k+1)-th largest count and drop non-positives).
  * `reduce` runs per-partition under Spark's partial aggregation, so
  * any use under `agg` already exercises distributed sketch union.
  *
  * Guarantee (survives merges): for every item, the estimate is an
  * undercount by at most n/(k+1) — so every item with true frequency
  * > n/(k+1) is present in the output, with
  * `est ∈ [f − n/(k+1), f]`. Pinned arithmetic-exactly by
  * HeavyHittersSpec and as the q60 oracle invariant.
  *
  * The per-row immutable-map update is O(k); k is small by
  * construction (a sketch with large k is a groupBy in denial).
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, MGSketch, Map[String, Long]] {
  require(k >= 1, s"capacity must be positive, got $k")

  override def zero: MGSketch = MGSketch(Map.empty, 0L)

  override def reduce(b: MGSketch, x: String): MGSketch = {
    val n = b.n + 1
    b.counters.get(x) match {
      case Some(c) => MGSketch(b.counters.updated(x, c + 1), n)
      case None if b.counters.size < k =>
        MGSketch(b.counters.updated(x, 1L), n)
      case None =>
        // Decrement-all: drops every counter by one (the arriving
        // item's implicit counter cancels against them), shedding any
        // that reach zero.
        MGSketch(
          b.counters.collect { case (v, c) if c > 1 => v -> (c - 1) },
          n)
    }
  }

  override def merge(a: MGSketch, b: MGSketch): MGSketch = {
    val sum = (a.counters.keySet ++ b.counters.keySet).iterator
      .map(v => v ->
        (a.counters.getOrElse(v, 0L) + b.counters.getOrElse(v, 0L)))
      .toMap
    val out =
      if (sum.size <= k) sum
      else {
        // Keep the k largest by subtracting the (k+1)-th largest
        // count from every counter — the offset generalizes reduce's
        // decrement-all, and it is what preserves the n/(k+1) bound
        // across merges (Agarwal et al., "Mergeable Summaries").
        val d = sum.valuesIterator.toSeq
          .sorted(Ordering[Long].reverse)(k)
        sum.collect { case (v, c) if c > d => v -> (c - d) }
      }
    MGSketch(out, a.n + b.n)
  }

  override def finish(b: MGSketch): Map[String, Long] = b.counters

  override def bufferEncoder: Encoder[MGSketch] =
    ExpressionEncoder[MGSketch]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
