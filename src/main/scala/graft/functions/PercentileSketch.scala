package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable percentile sketch as a typed `Aggregator`, built on
  * Spark's own Greenwald-Khanna summary (`QuantileSummaries` — the
  * machinery behind `DataFrame.stat.approxQuantile`), exposed as a
  * first-class aggregate so the MERGE path is a user-visible engine
  * operation rather than an internal of one method.
  *
  * Scale rationale: this is the entire 100 TB value of a quantile
  * sketch — each map task folds its partition into an O(1/ε·log(εn))
  * summary, the shuffle carries ONLY the summaries, and `merge`
  * combines them without revisiting rows. `reduce` runs per-partition
  * (partial aggregation), `merge` combines partial sketches across
  * partitions/groups — so any use under `agg` already exercises
  * distributed sketch union. The GK contract survives the merge: the
  * value returned for percentile p has true rank within ε·n of p·n
  * (same guarantee `approxQuantile` documents), pinned empirically in
  * ApproxSpec and as the q59 oracle invariant.
  *
  * Output: one value per requested percentile, in request order;
  * all-NaN when the group held no rows.
  */
class PercentileSketchAgg(
    percentiles: Seq[Double], relativeError: Double = 0.01)
    extends Aggregator[Double, QuantileSummaries, Seq[Double]] {

  override def zero: QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)

  override def reduce(b: QuantileSummaries, x: Double): QuantileSummaries =
    b.insert(x)

  // QuantileSummaries buffers inserts in an uncompressed head; both
  // merge() and query() require the head flushed, so compress at the
  // sketch-combination boundaries (idempotent on compressed input).
  override def merge(
      a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def finish(b: QuantileSummaries): Seq[Double] = {
    val c = b.compress()
    if (c.count == 0) Seq.fill(percentiles.size)(Double.NaN)
    else percentiles.map(p => c.query(p).get)
  }

  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
