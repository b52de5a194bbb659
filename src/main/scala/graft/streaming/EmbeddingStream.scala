package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `embeddings` table: EMBEDDING-based
  * continuous-ingest admission, quantized — the s14 sign-bit codes
  * reaching the streaming surface (st09/st12 admit on text SimHash;
  * this admits on the embedding, the semantic-dedup complement).
  *
  * The recall-then-verify split is the point of the design:
  *
  *  - the stream holds CODES, never vectors. Each arriving embedding
  *    collapses to two 32-bit sign words (s14's `bqEncode`, a pure
  *    projection) banded into 8 × 8-bit keys; the TTL'd state stores
  *    (vec_id, w0, w1, ts) = 32 bytes per member vs 512 B for the raw
  *    64-d vector — the state store stays O(rate × horizon) SMALL even
  *    when the horizon is long;
  *  - in-state work is a Hamming gate (`bit_count(xor)`, the cheapest
  *    distance in the engine) at ≤ `maxHamming` — strict-majority sign
  *    agreement (31 of 64) by default. The stream emits CANDIDATE
  *    pairs, i.e. decisions-to-check, not payloads (the st04 rule);
  *  - exact verification (cosine on the raw vectors, d06's bit-exact
  *    arithmetic) runs once per candidate in the batch drain, joining
  *    the tiny candidate set back to the corpus as a broadcast — the
  *    s12 re-rank shape. Candidates are ~3 per arrival measured at
  *    sf0.01/sf0.1 (vs 120 horizon-mates unfiltered): the band gate
  *    does its job before any 64-d arithmetic happens.
  *
  * Admission is first-wins like st09/st12: vec_b is rejected iff some
  * EARLIER vec_a within the event-time horizon shares a band, passes
  * the Hamming gate, and verifies at cosine > tau; every vector enters
  * state regardless, so rejected vectors still block later arrivals.
  */
object EmbeddingStream {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  final case class VecSigT(vec_id: Long, w0: Long, w1: Long, band_id: Int,
      band_key: Long, event_ts: java.sql.Timestamp)
  final case class CandPair(vec_a: Long, vec_b: Long, hamming: Int)

  /** Synthetic event-time base (the documents stream's convention:
    * 1 vector/sec from `vec_id`), so the oracle restates the horizon
    * as plain vec_id arithmetic.
    */
  val vecEpochSeconds: Long = 1735689600L // 2025-01-01T00:00:00Z

  /** File-source stream over the embeddings parquet. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(embSchema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)

  /** (vec_id, w0, w1, band_id, band_key, event_ts) rows from a
    * (streaming or batch) embeddings frame — projection-only: s14's
    * sign-bit encode, the two words cut into 8 × 8-bit band keys.
    */
  def bandedCodes(embeddings: DataFrame): DataFrame =
    graft.ops.Similarity.bqEncode(
      embeddings.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")))
      .filter(col("w0").isNotNull)
      .withColumn("event_ts",
        timestamp_seconds(lit(vecEpochSeconds) + col("vec_id")))
      .select(col("vec_id"), col("w0"), col("w1"), col("event_ts"),
        posexplode(array((0 until 8).map { b =>
          if (b < 4) shiftright(col("w0"), b * 8).bitwiseAND(lit(255L))
          else shiftright(col("w1"), (b - 4) * 8).bitwiseAND(lit(255L))
        }: _*)).as(Seq("band_id", "band_key")))
      .select(col("vec_id"), col("w0"), col("w1"), col("band_id"),
        col("band_key"), col("event_ts"))

  /** TTL'd band-bucket candidate generation — [[DocumentStream
    * .nearDupPairsTtl]]'s state machine over sign-bit codes: members
    * expire past the horizon, idle buckets are dropped wholesale by
    * `EventTimeTimeout`, and a pair emits iff the two codes agree on
    * the bucket's band AND on > 64 − `maxHamming` sign bits overall.
    */
  def candPairsTtl(
      ds: Dataset[VecSigT],
      horizon: java.time.Duration,
      maxHamming: Int): Dataset[CandPair] = {
    import ds.sparkSession.implicits._
    val horizonMs = horizon.toMillis
    ds.withWatermark("event_ts", "0 seconds")
      .groupByKey(d => (d.band_id, d.band_key))
      .flatMapGroupsWithState[List[(Long, Long, Long, Long)], CandPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), vecs: Iterator[VecSigT],
            state: GroupState[List[(Long, Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = vecs.toSeq.sortBy(d => (d.event_ts.getTime, d.vec_id))
            var seen = state.getOption.getOrElse(Nil) // (vec_id, w0, w1, tsMs)
            val out = Seq.newBuilder[CandPair]
            sorted.foreach { d =>
              val t = d.event_ts.getTime
              seen = seen.filter(_._4 >= t - horizonMs) // expire members
              seen.foreach { case (id, w0, w1, _) =>
                if (id != d.vec_id) {
                  val h = java.lang.Long.bitCount(w0 ^ d.w0) +
                    java.lang.Long.bitCount(w1 ^ d.w1)
                  if (h <= maxHamming)
                    out += CandPair(
                      math.min(id, d.vec_id), math.max(id, d.vec_id), h)
                }
              }
              seen = (d.vec_id, d.w0, d.w1, t) :: seen
            }
            state.update(seen)
            state.setTimeoutTimestamp(seen.map(_._4).max + horizonMs)
            out.result().iterator
          }
      }
  }

  /** The full quantized admission pipeline: stream → sign-bit codes →
    * TTL'd band-bucket Hamming gate → batch exact-cosine verify of the
    * drained candidates → per-vector admit/reject roster.
    *
    * The verify joins are both broadcasts of candidate-sized frames
    * onto the corpus scan (the s12 re-rank shape) — the corpus is
    * never shuffled, and the only frames collected are the streamed
    * candidate decisions.
    */
  def runStreamAdmissionQuantized(
      spark: SparkSession, dir: String,
      horizonSeconds: Long = 120L,
      maxHamming: Int = 31,
      tau: Double = 0.25): DataFrame = {
    import spark.implicits._
    val pairs = DocumentStream.drainToTable(spark, candPairsTtl(
      bandedCodes(readStream(spark, dir)).as[VecSigT],
      java.time.Duration.ofSeconds(horizonSeconds), maxHamming))
    val cand = pairs.select("vec_a", "vec_b").distinct()
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.VectorExpressions.dot(a, b)
    graft.functions.VectorExpressions.register(spark)
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val withA = e.join(broadcast(cand), col("vec_id") === col("vec_a"))
      .select(col("vec_a"), col("vec_b"),
        col("v").as("va"), col("nrm").as("na"))
    val rejected = e.as("b").join(broadcast(withA.as("a")),
        col("b.vec_id") === col("a.vec_b"))
      .filter(dot(col("a.va"), col("b.v")) / (col("a.na") * col("b.nrm"))
        > tau)
      .select(col("a.vec_b").as("vec_id")).distinct()
      .withColumn("rej", lit(1))
    graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"))
      .join(rejected, Seq("vec_id"), "left")
      .select(col("vec_id"),
        (coalesce(col("rej"), lit(0)) === 0).cast("int").as("admitted"))
      .orderBy("vec_id")
  }
}
