package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode/feature-extract stubs.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (`FakeDecoder`) — but the
  * Spark-side plumbing is real: binary columns, metadata structs,
  * fixed-shape feature vectors, and a `mapPartitions` batch boundary
  * shaped exactly like a model-inference / codec call would be at
  * 100 TB (per-partition batching, no driver involvement, schema
  * declared up front).
  */
object Multimodal {

  /** Input row for the decode stage: key + opaque payload. */
  final case class Blob(doc_id: Long, payload: Array[Byte])

  /** Output row: key + "decoded" metadata + fixed-shape features. */
  final case class Decoded(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Int,
      features: Array[Float])

  /** Resized variant: key + target dims + scale factor. */
  final case class Resized(
      doc_id: Long,
      width: Int,
      height: Int,
      out_width: Int,
      out_height: Int,
      scale: Double)

  /** STUB resize: aspect-preserving thumbnail arithmetic on the
    * decoded dimensions (the real op would hand pixel buffers to a
    * codec; the dimension math and row shape are the engine-side
    * contract).
    */
  def fakeResize(d: Decoded, maxSide: Int = 64): Resized = {
    val s = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
    Resized(d.doc_id, d.width, d.height,
      math.max(1, math.round(d.width * s).toInt),
      math.max(1, math.round(d.height * s).toInt), s)
  }

  /** STUB: stands in for an image/audio decoder + feature extractor.
    * Deterministic in the payload bytes so tests and reruns agree.
    * A real deployment swaps only this function (e.g. JNI codec or
    * ONNX session held per partition); the surrounding plumbing is
    * unchanged.
    */
  /** Batch decode — THE inference-shaped entry point: the whole batch
    * is handed over in one call (a real implementation would stack the
    * payloads into one tensor / feed the codec a buffer list and get
    * the batch's outputs back in order). `fakeDecode` is the
    * per-element stand-in it maps over.
    */
  def fakeDecodeBatch(batch: Seq[Blob]): Seq[Decoded] =
    batch.map(fakeDecode)

  /** DuckDB re-statement of `fakeDecode`'s hash fold: the Scala fold
    * `h = foldLeft(17L)((acc, byte) => acc * 31 + byte)` over SIGNED
    * payload bytes, with Long wrap-around, is deterministic integer
    * arithmetic — so the stub decoder IS oracle-checkable. Bytes come
    * from hex(encode(text)) two chars at a time (sign-adjusted:
    * u >= 128 → u - 256), the fold runs in HUGEINT mod 2^64 (DuckDB
    * BIGINT errors on overflow where Scala Long wraps), and width/
    * height/feat0 read low bit-fields of the unsigned residue —
    * identical to the signed value's low bits.
    */
  private val sqlDecodeAcc =
    """hx AS (
         SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           hex(encode(text)) AS h
         FROM documents WHERE text IS NOT NULL),
       acc AS (
         SELECT doc_id, n_bytes,
           list_reduce(
             list_prepend(CAST(17 AS HUGEINT),
               list_transform(
                 list_transform(range(0, CAST(length(h) AS BIGINT) // 2),
                   i -> CAST(('0x' || substr(h, CAST(2*i + 1 AS INT), 2)) AS INT)),
                 u -> CAST(CASE WHEN u < 128 THEN u ELSE u - 256 END AS HUGEINT))),
             (a, x) -> ((a * 31 + x) % 18446744073709551616
                        + 18446744073709551616) % 18446744073709551616) AS hv
         FROM hx)"""

  def fakeDecode(b: Blob): Decoded = {
    val n = b.payload.length
    val h = b.payload.foldLeft(17L)((acc, x) => acc * 31 + x)
    val feats = Array.tabulate(8) { i =>
      // hash-derived pseudo-features in [-1, 1)
      (((h >>> (i * 8)) & 0xffL).toFloat / 128f) - 1f
    }
    Decoded(b.doc_id, 16 + (h & 0xf).toInt * 16, 16 + ((h >> 4) & 0xf).toInt * 16,
      n, feats)
  }

  /** Per-(session, dir) memo of [[decodedFrame]] — the Similarity
    * artifact-memo discipline (ivfSq8TrainShared): the decode is the
    * expensive codec/model-inference boundary, and m05/m06/m07 each
    * consume the SAME decoded corpus, so repeated Verify/Bench passes
    * reuse one pinned localCheckpoint instead of stacking a fresh
    * full-corpus checkpoint per invocation and leaving the old blocks
    * to the ContextCleaner (the r12 ADVICE item). Entries of stopped
    * sessions are dropped on insert — their checkpointed blocks died
    * with the session.
    */
  private val decodedMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The decoded-feature frame (doc_id, width, height, n_bytes, v) —
    * built ONCE per (session, dir) and localCheckpoint'd: the
    * m05/m07 self-joins (two sides) and m06's extra dims branch would
    * otherwise re-run the whole corpus decode per consumer.
    */
  private def decodedFrame(s: SparkSession, dir: String): DataFrame = {
    // Evict only entries of STOPPED sessions: evicting any other
    // session's entry would (a) thrash the memo when two live
    // sessions alternate and (b) leave the evicted frame's
    // checkpointed blocks pinned in its still-live session. A stopped
    // session's blocks died with it, so plain removal suffices.
    decodedMemo.keys.filter(_._1.sparkContext.isStopped)
      .foreach(decodedMemo.remove)
    decodedMemo.getOrElseUpdate((s, dir),
      decodeDocs(Tables.load(s, dir, "documents")).localCheckpoint())
  }

  /** Drop (and free) this session's memoized decode for `dir` — the
    * explicit invalidation path for a corpus rewritten mid-session
    * (the memo otherwise serves the stale decode by design).
    */
  def invalidateDecoded(s: SparkSession, dir: String): Unit =
    decodedMemo.remove((s, dir)).foreach(Similarity.freeCheckpoint)

  /** The un-memoized decode of an arbitrary (doc_id, text) frame —
    * factored so ScaleSmoke can drive it on scaled corpora.
    */
  private[graft] def decodeDocs(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .filter(col("payload").isNotNull)
      .as[Blob]
      .mapPartitions(_.grouped(64).flatMap(batch => fakeDecodeBatch(batch)))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
        transform(col("features"), x => x.cast("double")).as("v"))
  }

  /** The m05/m06-shared near-dup candidate frame over a
    * [[decodedFrame]]: payloads blocked on byte length, every blocked
    * pair scored by decoded-feature cosine (6-dp, oracle-exact —
    * hash features are 1/128-multiples).
    * Returns (doc_a, doc_b, n_bytes, cos_sim).
    */
  private def featurePairFrame(dec: DataFrame): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.dot(a, b)
    dec.as("a").join(dec.as("b"),
        col("a.n_bytes") === col("b.n_bytes") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(dot(col("a.v"), col("a.v")) > 0 &&
        dot(col("b.v"), col("b.v")) > 0)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_bytes").as("n_bytes"),
        round(dot(col("a.v"), col("b.v")) /
          (sqrt(dot(col("a.v"), col("a.v"))) *
            sqrt(dot(col("b.v"), col("b.v")))), 6).as("cos_sim"))
  }

  /** The 8-bit feature SIGN code (bit i set iff feature i ≥ 0) — the
    * s14/SRP binary signature of the perceptual embedding, used as a
    * BLOCK KEY component by m07/m08. Features are exact
    * 1/128-multiples, so the sign test is integer-exact cross-engine.
    */
  private[graft] def signCode: org.apache.spark.sql.Column =
    (0 until 8).map(i =>
      when(element_at(col("v"), i + 1) >= 0, lit(1 << i))
        .otherwise(lit(0))).reduce(_ + _).cast("int")

  /** m07's pair stage, factored for direct spec coverage: per
    * (width, height, sig) block, the best near-dup pair among pairs
    * whose sign codes differ by AT MOST ONE BIT — enforced by
    * construction, never by a post-join Hamming filter. The LEFT side
    * replicates each row into its own sig bucket plus the 8 flip-1
    * Hamming neighbors (multi-probe, the s14/d11 banding idea); the
    * RIGHT side keys on its exact sig — so a pair (a, b) with
    * a.doc_id < b.doc_id collides EXACTLY once (Hamming 0 via the
    * identity probe, Hamming 1 via the single differing-bit flip) and
    * the join key is the full (width, height, sig) block: ≤65 k keys,
    * per-block population ~N/65 536 on hash-uniform features — the
    * production layout the r12 verdict asked for, vs the ≤256-key
    * (width, height) blocking whose within-block self-join was
    * quadratic at corpus scale. Pairs at Hamming ≥ 2 are invisible by
    * design: with a REAL decoder, a re-encode preserves dims and all
    * (or all-but-one near-boundary) feature signs, which is exactly
    * the recall flip-1 multi-probe recovers.
    * Input: (doc_id, width, height, v). Output: one row per populated
    * (width, height, sig) bucket — sig is the PROBED bucket key (the
    * right side's exact code) — with the bucket's best pair by
    * cosine, its sign-match verdict, and the ≥0.999 dup flag.
    */
  private[graft] def perceptualBestPairs(dec: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("width"), col("height"), col("sig"))
      .orderBy(col("cos_sim").desc, col("doc_a"), col("doc_b"))
    perceptualPairs(dec)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("width"), col("height"), col("sig"),
        col("doc_a"), col("doc_b"), col("sig_match"), col("cos_sim"),
        (col("cos_sim") >= 0.999).cast("int").as("is_dup"))
  }

  /** The FULL Hamming-≤1 pair frame m07's per-block ranking and m08's
    * keeper election both consume — the probes-join stage factored on
    * its own: every (doc_a < doc_b) pair agreeing on (width, height)
    * whose sign codes differ by at most one bit, collided exactly
    * once via flip-1 multi-probe (see [[perceptualBestPairs]]'s
    * collision argument), scored by decoded-feature cosine. Output
    * (width, height, sig, doc_a, doc_b, sig_match, cos_sim); sig is
    * the right side's exact code (the probed bucket key).
    */
  private[graft] def perceptualPairs(dec: DataFrame): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.dot(a, b)
    val sig = dec.withColumn("sig", signCode)
      .filter(dot(col("v"), col("v")) > 0)
    val probes = sig.withColumn("probe",
      explode(array(col("sig") +: (0 until 8).map(i =>
        col("sig").bitwiseXOR(lit(1 << i))): _*)))
    probes.as("a").join(sig.as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.probe") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.width").as("width"), col("a.height").as("height"),
        col("b.sig").as("sig"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.sig") === col("b.sig")).cast("int").as("sig_match"),
        round(dot(col("a.v"), col("b.v")) /
          (sqrt(dot(col("a.v"), col("a.v"))) *
            sqrt(dot(col("b.v"), col("b.v")))), 6).as("cos_sim"))
  }

  /** Multimodal dedup KEEPERS (m08) — the verdict operator a
    * multimodal curation pass actually consumes, d17's keep-best
    * discipline over m07's perceptual families: Hamming-≤1 pairs at
    * cosine ≥ 0.999 (the m07 dup gate) define the duplicate edges,
    * each blob's family label is the one-hop minimum over itself and
    * its partners (d07/d17's one-hop convention — every mutually-
    * paired clone set collapses; chains spanning blocks may stay
    * split, exactly as d17's bucket hops may), and the family's
    * keeper is its LARGEST-PAYLOAD member (n_bytes desc, ties →
    * lowest doc_id) — a curation pass keeps the highest-fidelity
    * copy, the multimodal counterpart of d17 electing the
    * highest-quality text. Blobs with no dup partner (including
    * zero-feature blobs, which can't be cosine-scored) are singleton
    * families and keep themselves. Scale shape: edges come from
    * [[perceptualPairs]]'s bounded (dims, sig) blocks; the neighbor
    * min is one map-side-combining aggregate over edge endpoints; the
    * keeper argmax is one window per family (families are duplicate
    * clusters — small by construction). Output (doc_id, family,
    * n_bytes, is_kept) for EVERY decoded blob.
    */
  private[graft] def perceptualKeepers(dec: DataFrame): DataFrame = {
    val edges = perceptualPairs(dec)
      .filter(col("cos_sim") >= 0.999)
      .select(col("doc_a"), col("doc_b"))
    val nbrMin = edges
      .select(col("doc_a").as("doc_id"), col("doc_b").as("nbr"))
      .unionByName(edges
        .select(col("doc_b").as("doc_id"), col("doc_a").as("nbr")))
      .groupBy("doc_id").agg(min(col("nbr")).as("nbr_min"))
    val w = Window.partitionBy(col("family"))
      .orderBy(col("n_bytes").desc, col("doc_id"))
    dec.select(col("doc_id"), col("n_bytes"))
      .join(nbrMin, Seq("doc_id"), "left")
      .withColumn("family",
        least(col("doc_id"), coalesce(col("nbr_min"), col("doc_id"))))
      .withColumn("is_kept", (row_number().over(w) === 1).cast("int"))
      .select(col("doc_id"), col("family"), col("n_bytes"),
        col("is_kept"))
  }

  /** Multimodal eval-set DECONTAMINATION (m09) — d20's benchmark-leak
    * gate applied to payloads: a training blob is flagged when its
    * DECODED representation perceptually near-dups a held-out eval
    * blob (same (width, height), sign codes within Hamming 1, cosine
    * ≥ 0.999 — the m07 dup gate), so a re-encoded copy of an eval
    * image can't hide in the training set the way byte-digest
    * matching would allow. The eval set is carved deterministically
    * (doc_id % `evalMod` = 0, the d20 stand-in for the real benchmark
    * table).
    *
    * Scale shape — d20's asymmetry, multimodally: the eval side is
    * tiny (benchmarks, not corpora), so IT carries the 9× flip-1
    * multi-probe replication and BROADCASTS; the training corpus
    * keys on its exact (width, height, sig) and the contamination
    * probe is a map-side hash join — the corpus never shuffles, and
    * Hamming is never computed post-join (a Hamming-0/1 (train, eval)
    * pair collides exactly once: identity probe or the single
    * differing-bit flip — [[perceptualBestPairs]]'s argument across
    * two sets). The cosine verify runs only on collided pairs.
    * Output (doc_id, n_eval_hits, is_kept) for EVERY decoded
    * training blob; zero-feature blobs can't be cosine-scored, pair
    * with nothing, and keep trivially.
    */
  private[graft] def perceptualDecontaminate(
      dec: DataFrame, evalMod: Int = 23): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.dot(a, b)
    val isEval = col("doc_id") % evalMod === 0
    val sig = dec.withColumn("sig", signCode)
      .filter(dot(col("v"), col("v")) > 0)
    val evalProbes = sig.filter(isEval)
      .withColumn("probe",
        explode(array(col("sig") +: (0 until 8).map(i =>
          col("sig").bitwiseXOR(lit(1 << i))): _*)))
      .select(col("doc_id").as("eval_id"), col("width"), col("height"),
        col("probe"), col("v").as("ev"))
    val hits = sig.filter(!isEval).as("t")
      .join(broadcast(evalProbes).as("e"),
        col("t.width") === col("e.width") &&
          col("t.height") === col("e.height") &&
          col("t.sig") === col("e.probe"))
      .filter(round(dot(col("t.v"), col("ev")) /
        (sqrt(dot(col("t.v"), col("t.v"))) *
          sqrt(dot(col("ev"), col("ev")))), 6) >= 0.999)
      .select(col("t.doc_id").as("doc_id"), col("eval_id"))
    val nEval = hits.distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_eval_hits"))
    dec.filter(!isEval).select(col("doc_id"))
      .join(nEval, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        (coalesce(col("n_eval_hits"), lit(0L)) === 0).cast("int")
          .as("is_kept"))
      .orderBy("doc_id")
  }

  /** The m10 gate body over a decoded frame (doc_id, width, height,
    * n_bytes, v), factored so the spec can drive engineered blobs
    * through the precedence: m09 decontamination ≻ m08 keeper
    * election (over the training slice only — eval blobs are not
    * corpus candidates) ≻ min-side-≥-32 size floor.
    */
  private[graft] def multimodalAdmission(dec: DataFrame): DataFrame = {
    val train = dec.filter(col("doc_id") % 23 =!= 0)
    val decon = perceptualDecontaminate(dec, evalMod = 23)
      .select(col("doc_id"), col("is_kept").as("decon_ok"))
    val keep = perceptualKeepers(train
        .select(col("doc_id"), col("width"), col("height"),
          col("n_bytes"), col("v")))
      .select(col("doc_id"), col("is_kept").as("keeper_ok"))
    train.select(col("doc_id"), col("width"), col("height"),
        col("n_bytes"))
      .join(decon, "doc_id")
      .join(keep, "doc_id")
      .withColumn("size_ok",
        (least(col("width"), col("height")) >= 32).cast("int"))
      .select(col("doc_id"), col("width"), col("height"),
        col("n_bytes"), col("decon_ok"), col("keeper_ok"),
        col("size_ok"),
        when(col("decon_ok") === 0, "contaminated")
          .when(col("keeper_ok") === 0, "duplicate")
          .when(col("size_ok") === 0, "too_small")
          .otherwise("admitted").as("verdict"))
      .orderBy("doc_id")
  }

  /** feats[i] = ((h >>> 8i) & 0xff)/128 - 1, restated per byte field
    * of the HUGEINT residue — the DuckDB form of the stub features.
    */
  private val sqlFeatsList: String = (0 until 8).map { i =>
    val div = java.math.BigInteger.valueOf(256L).pow(i)
    s"(hv // CAST('$div' AS HUGEINT)) % 256 / 128.0 - 1.0"
  }.mkString("[", ",\n             ", "]")

  /** The 8-bit feature sign code in DuckDB: bit i set iff feature i
    * ≥ 0 ⇔ its residue byte ≥ 128 (features are exact 1/128-
    * multiples, so the sign test is integer-exact on both engines).
    */
  private val sqlSigExpr: String = (0 until 8).map { i =>
    val div = java.math.BigInteger.valueOf(256L).pow(i)
    s"CASE WHEN (hv // CAST('$div' AS HUGEINT)) % 256 >= 128 THEN ${1 << i} ELSE 0 END"
  }.mkString(" + ")

  /** DuckDB restatement of [[featurePairFrame]] as CTEs `f` (feature
    * vectors per byte field of the decode residue) + `pairs` — append
    * after [[sqlDecodeAcc]]. Shared by the m05 and m06 oracles.
    */
  private val sqlFeaturePairsCtes: String = {
    val feats = sqlFeatsList
    s"""f AS (
          SELECT doc_id, n_bytes,
            $feats AS v
          FROM acc),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_bytes,
            ROUND(
              list_sum(list_transform(list_zip(a.v, b.v),
                                      p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
               sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)
              AS cos_sim
          FROM f a JOIN f b
            ON a.n_bytes = b.n_bytes AND a.doc_id < b.doc_id
          WHERE list_sum(list_transform(a.v, x -> x * x)) > 0
            AND list_sum(list_transform(b.v, x -> x * x)) > 0)"""
  }

  /** m03's frame track as a 28-bit feature array: 64-char chunks at
    * stride 192, each reduced to a md5-prefix integer (deterministic
    * stand-in for a decoded per-frame statistic). Shared by m12's
    * scene cuts and m13's silence runs.
    */
  private val frameFeatsSql: String =
    // greatest(length, 1): pins empty text to ONE frame of md5('')
    // in BOTH engines. Without it Spark's (-1 div 192) = 0 (truncate
    // toward zero → one frame) while DuckDB's (-1 // 192 + 1) = 0
    // (floor → zero frames) — a divergence masked only while the
    // corpus has no empty documents (ADVICE r14).
    """transform(sequence(0, (greatest(length(text), 1) - 1) div 192),
         i -> cast(conv(substring(
                md5(substring(text, i*192 + 1, 64)),
                1, 7), 16, 10) as bigint))"""

  /** m12 body: frame-differencing scene cuts over a (doc_id, text)
    * frame. Frames are m03's 64-char chunks at stride 192; the 28-bit
    * md5-prefix feature stands in for a mean-luminance decode; a
    * boundary fires where adjacent features differ by > 2²⁷ (half the
    * range). Pure per-row HOF arithmetic — no shuffle, no explode.
    */
  def sceneDetect(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(frameFeatsSql).as("feats"))
      .select(col("doc_id"), size(col("feats")).as("n_frames"),
        // sequence(1, greatest(size-1, 1)) never descends (Spark's
        // sequence defaults to step -1 when start > stop); the
        // i <= size-1 guard voids the padding element on
        // single-frame payloads.
        expr("""filter(sequence(1, greatest(size(feats) - 1, 1)),
                  i -> i <= size(feats) - 1 AND
                       abs(element_at(feats, i + 1) -
                           element_at(feats, i)) > 134217728)""")
          .as("bounds"))
      .select(col("doc_id"), col("n_frames"),
        (size(col("bounds")) + 1).as("n_scenes"),
        md5(concat_ws(",",
          expr("transform(bounds, b -> cast(b as string))")))
          .as("bounds_digest"))
      .orderBy("doc_id")

  /** m13 body: silence-run detection over the same frame track — the
    * audio-curation staple (dead-air trimming, stuck-encoder drops):
    * a frame is "silent" when its 28-bit feature falls below a
    * quarter of the range (the RMS-floor stand-in), and the operator
    * reports how MANY maximal silent runs each payload has and the
    * longest one. The run-length scan is ONE aggregate() fold over
    * the flag array carrying a (current, best, runs) struct — strictly
    * sequential per payload, embarrassingly parallel across payloads,
    * zero shuffle, zero explode. The oracle deliberately restates the
    * runs by the OPPOSITE construction — unnest + gaps-and-islands
    * (idx − row_number) — so the hash match cross-checks two
    * independent run-length formulations.
    */
  def silenceRuns(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(frameFeatsSql).as("feats"))
      .select(col("doc_id"), size(col("feats")).as("n_frames"),
        expr("size(filter(feats, f -> f < 67108864))").as("n_silent"),
        expr("""aggregate(
                  transform(feats, f -> IF(f < 67108864, 1, 0)),
                  named_struct('cur', 0, 'best', 0, 'runs', 0),
                  (s, x) -> named_struct(
                    'cur', IF(x = 1, s.cur + 1, 0),
                    'best', greatest(s.best, IF(x = 1, s.cur + 1, 0)),
                    'runs', s.runs + IF(x = 1 AND s.cur = 0, 1, 0)))""")
          .as("st"))
      .select(col("doc_id"), col("n_frames"), col("n_silent"),
        col("st.runs").as("n_runs"), col("st.best").as("longest_run"))
      .orderBy("doc_id")

  /** m14 body: silence-TRIM execution — m13 measures silent runs,
    * this removes them: every frame whose 28-bit feature falls below
    * the silence threshold is dropped in place, and the trimmed track
    * ships as kept-count + an order-exact digest over the surviving
    * frame digests. Same map-only shape as m13 (one per-row HOF pass,
    * no shuffle, no explode) — at 100 TB trimming is a map stage
    * whose cost is the scan.
    */
  def silenceTrim(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(
        // (digest, feature) per frame — the digest is the frame's
        // identity, the feature its stand-in decode (m03/m13's rule).
        """transform(
             sequence(0, (greatest(length(text), 1) - 1) div 192),
             i -> named_struct(
               'd', md5(substring(text, i*192 + 1, 64)),
               'f', cast(conv(substring(
                      md5(substring(text, i*192 + 1, 64)),
                      1, 7), 16, 10) as bigint)))""").as("fs"))
      .select(col("doc_id"), size(col("fs")).as("n_frames"),
        expr("filter(fs, s -> s.f >= 67108864)").as("kept"))
      .select(col("doc_id"), col("n_frames"),
        size(col("kept")).as("n_kept"),
        md5(concat_ws("", expr("transform(kept, s -> s.d)")))
          .as("trim_digest"))
      .orderBy("doc_id")

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "m01_binary_metadata",
      (s, dir) =>
        // Binary-column metadata pass: treat text bytes as an opaque
        // payload; length + content digest are computed without ever
        // interpreting the payload (the pattern for raw image/audio
        // columns at scale — metadata flows in columns, payload stays
        // opaque).
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          .select(
            col("doc_id"),
            octet_length(col("payload")).as("n_bytes"),
            md5(col("payload")).as("digest"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          CAST(octet_length(encode(text)) AS INT) AS n_bytes,
          md5(text) AS digest
        FROM documents ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m03_frame_sample",
      (s, dir) =>
        // Frame-sampling plumbing over an opaque payload: cut the
        // payload into fixed 64-char frames at stride 192 (≙ every 3rd
        // frame of a video track), digest each sampled frame, emit a
        // per-payload digest + frame count. The chunk/stride/sample
        // arithmetic is the real pattern; only the payload is text
        // standing in for codec output.
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            // greatest(length, 1): empty text = one frame of md5('')
            // in both engines (see frameFeatsSql's note).
            expr("""transform(
                      sequence(0, (greatest(length(text), 1) - 1) div 192),
                      i -> md5(substring(text, i*192 + 1, 64)))""")
              .as("frame_digests"))
          .select(col("doc_id"),
            size(col("frame_digests")).as("n_frames"),
            md5(concat_ws("", col("frame_digests"))).as("sample_digest"))
          .orderBy("doc_id"),
      Some("""
        WITH f AS (
          SELECT doc_id,
            list_transform(range(0, (greatest(length(text), 1) - 1) // 192 + 1),
                           i -> md5(substr(text, CAST(i*192 + 1 AS INT), 64)))
              AS frame_digests
          FROM documents)
        SELECT doc_id,
          CAST(len(frame_digests) AS INT) AS n_frames,
          md5(array_to_string(frame_digests, '')) AS sample_digest
        FROM f ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m04_resize_thumbnails",
      (s, dir) => {
        // decode → resize chained in one typed pipeline (rows-only:
        // dims derive from the stub decoder's payload hash).
        val spark = s
        import spark.implicits._
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          .filter(col("payload").isNotNull)
          .as[Blob]
          .mapPartitions(_.grouped(64).flatMap(batch =>
            fakeDecodeBatch(batch).map(b => fakeResize(b))))
          .toDF()
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $sqlDecodeAcc,
        dims AS (
          SELECT doc_id,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height
          FROM acc),
        r AS (
          SELECT doc_id, width, height,
            LEAST(1.0, 64.0 / GREATEST(width, height)) AS scale
          FROM dims)
        SELECT doc_id, width, height,
          GREATEST(1, CAST(floor(width * scale + 0.5) AS INT)) AS out_width,
          GREATEST(1, CAST(floor(height * scale + 0.5) AS INT)) AS out_height,
          scale
        FROM r ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m02_decode_features",
      (s, dir) => {
        // Decode/feature-extract over a binary column via typed
        // mapPartitions (the batch boundary a real codec/model call
        // needs). Oracle-checked: the stub decoder's hash fold is
        // plain integer arithmetic, restated in DuckDB (sqlDecodeAcc).
        val spark = s
        import spark.implicits._
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          // undecodable (null) payloads are skipped, not crashed on
          .filter(col("payload").isNotNull)
          .as[Blob]
          // Batch boundary shaped like real inference: the decoder
          // sees fixed-size batches (a codec/ONNX session would be
          // opened once per partition, fed 64 payloads at a time) —
          // the BATCH is what crosses the call boundary, not elements.
          .mapPartitions(_.grouped(64).flatMap(batch => fakeDecodeBatch(batch)))
          .toDF()
          .select(col("doc_id"), col("width"), col("height"),
            col("n_bytes"), element_at(col("features"), 1).as("feat0"))
          .orderBy("doc_id")
      },
      // feat0 = low byte / 128 - 1: every value is an exact multiple
      // of 1/128, representable in FLOAT — the double-arithmetic
      // restatement then casts down losslessly. floor(x + 0.5) is
      // Scala's math.round (not DuckDB's half-away round).
      Some(s"""
        WITH $sqlDecodeAcc
        SELECT doc_id,
          CAST(16 + (hv % 16) * 16 AS INT) AS width,
          CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height,
          n_bytes,
          CAST((hv % 256) / 128.0 - 1.0 AS FLOAT) AS feat0
        FROM acc ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m05_feature_neardup",
      (s, dir) => {
        // Multimodal near-dup REPORT: candidates BLOCK on the payload
        // byte length (the pre-decode block key an image-dedup pass
        // uses before touching pixels — same file size), then every
        // blocked pair is scored by decoded-feature cosine and
        // flagged `is_dup` at ≥ 0.999 (the stub's hash features make
        // exact-payload clones score 1.0 and everything else ~random).
        // The block join is an equi-join on n_bytes; per-block
        // populations are small (matching byte lengths), so the pair
        // expansion is bounded — at sf0.1 the whole report is ~25k
        // pairs from 50k docs. Features come from the same
        // mapPartitions decode boundary as m02 (stub decoder, real
        // plumbing); hash-derived features are exact 1/128-multiples,
        // so the cosine column is oracle-exact.
        featurePairFrame(decodedFrame(s, dir))
          .withColumn("is_dup", (col("cos_sim") >= 0.999).cast("int"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""
        WITH $sqlDecodeAcc,
        $sqlFeaturePairsCtes
        SELECT doc_a, doc_b, n_bytes, cos_sim,
          CAST(cos_sim >= 0.999 AS INT) AS is_dup
        FROM pairs
        ORDER BY doc_a, doc_b""")),
    // ----------------------------------------------------------------
    Q(
      "m06_multimodal_data_card",
      (s, dir) => {
        // Multimodal data card — p05's per-source audit shape over
        // the BINARY tier: payload volume, decoded-format spread, and
        // both dup tiers (exact payload digests + m05's feature
        // near-dups) per source. The report a multimodal corpus
        // release ships beside p05's text card. Scale shape: three
        // map-side-combining aggregate branches joined on the tiny
        // source key (p05's no-Expand discipline — distincts are
        // dedup-THEN-count branches), the decode is m02's
        // mapPartitions batch boundary, and the near-dup leg reuses
        // m05's byte-length-blocked pairs (never all-pairs).
        val spark = s
        import spark.implicits._
        val d = Tables.load(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            encode(col("text"), "UTF-8").as("payload"))
        val meta = d.select(col("doc_id"), col("source"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("digest"))
        val stats = meta.groupBy("source").agg(
          count(lit(1)).as("n_payloads"),
          sum(col("n_bytes").cast("long")).as("total_bytes"))
        val uniq = meta.select("source", "digest").distinct()
          .groupBy("source").agg(count(lit(1)).as("n_uniq"))
        // ONE decode pass feeds both the dims branch and the pair
        // frame (decodedFrame is checkpointed).
        val dec = decodedFrame(s, dir)
        val formats = dec.select(col("doc_id"), col("width"), col("height"))
          .join(meta.select("doc_id", "source"), "doc_id")
          .select("source", "width", "height").distinct()
          .groupBy("source").agg(count(lit(1)).as("n_formats"))
        val nearDup = featurePairFrame(dec)
          .filter(col("cos_sim") >= 0.999)
          .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .distinct()
          .join(meta.select("doc_id", "source"), "doc_id")
          .groupBy("source").agg(count(lit(1)).as("n_near_dup"))
        stats.join(uniq, "source").join(formats, "source")
          .join(nearDup, Seq("source"), "left")
          .select(col("source"), col("n_payloads"), col("total_bytes"),
            col("n_formats"),
            (col("n_payloads") - col("n_uniq")).as("dup_docs"),
            coalesce(col("n_near_dup"), lit(0L)).as("near_dup_docs"))
          .orderBy("source")
      },
      Some(s"""
        WITH $sqlDecodeAcc,
        $sqlFeaturePairsCtes,
        meta AS (
          SELECT doc_id, source,
            CAST(octet_length(encode(text)) AS INT) AS n_bytes,
            md5(text) AS digest
          FROM documents WHERE text IS NOT NULL),
        stats AS (
          SELECT source, COUNT(*) AS n_payloads,
            CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
          FROM meta GROUP BY source),
        uniq AS (
          SELECT source, COUNT(*) AS n_uniq FROM (
            SELECT DISTINCT source, digest FROM meta)
          GROUP BY source),
        dims AS (
          SELECT doc_id,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height
          FROM acc),
        formats AS (
          SELECT source, COUNT(*) AS n_formats FROM (
            SELECT DISTINCT m.source, d.width, d.height
            FROM dims d JOIN meta m USING (doc_id))
          GROUP BY source),
        nd AS (
          SELECT m.source, COUNT(*) AS n_near_dup FROM (
            SELECT doc_a AS doc_id FROM pairs WHERE cos_sim >= 0.999
            UNION
            SELECT doc_b FROM pairs WHERE cos_sim >= 0.999) p
          JOIN meta m USING (doc_id)
          GROUP BY m.source)
        SELECT s.source, s.n_payloads, s.total_bytes, f.n_formats,
          s.n_payloads - u.n_uniq AS dup_docs,
          COALESCE(nd.n_near_dup, 0) AS near_dup_docs
        FROM stats s
        JOIN uniq u USING (source)
        JOIN formats f USING (source)
        LEFT JOIN nd USING (source)
        ORDER BY s.source""")),
    // ----------------------------------------------------------------
    Q(
      "m07_perceptual_neardup",
      (s, dir) =>
        // PERCEPTUAL near-dup audit — the size-INDEPENDENT tier m05
        // lacks: m05 blocks on payload byte length, so the same
        // content re-encoded at a different size is invisible to it.
        // Here blocking uses the DECODED representation, and the pair
        // join key is the FULL (width, height, sig) block — format
        // dims PLUS the 8-bit feature sign code (s14/SRP binary
        // signature), ≤65 k keys — with flip-1 Hamming multi-probe on
        // the left side so near-boundary signs (one flipped bit) are
        // still paired (see [[perceptualBestPairs]] for the
        // exactly-once collision argument). The report is each
        // populated block's BEST pair with its sig_match and is_dup
        // verdicts — the audit a multimodal dedup pass reads to pick
        // format families for the expensive tier. With a REAL decoder
        // a re-encoded image keeps its dims and (near-)all feature
        // signs and lands in a probed block regardless of file size;
        // the stub's features are byte-derived, so only byte-exact
        // clones reach cos 1.0 here — the oracle checks the machinery
        // (sig blocking, multi-probe, verify, per-block ranking); the
        // decoder swap point is m02's. Scale shape: signature is a
        // pure projection; the 9× probe replication is a flat map
        // (linear); the self-join is an equi-join on the 65 k-key
        // block with per-block population ~N/65 536 on hash-uniform
        // features (ScaleSmoke `multimodal` measures it at ×100 vs
        // the old ≤256-key dims-only blocking); the best pair is one
        // partitioned window over blocks.
        perceptualBestPairs(
          decodedFrame(s, dir)
            .select(col("doc_id"), col("width"), col("height"), col("v")))
          .orderBy("width", "height", "sig"),
      Some(s"""
        WITH $sqlDecodeAcc,
        f AS (
          SELECT doc_id,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height,
            $sqlFeatsList AS v,
            CAST($sqlSigExpr AS INT) AS sig
          FROM acc),
        fz AS (
          SELECT * FROM f
          WHERE list_sum(list_transform(v, x -> x * x)) > 0),
        pairs AS (
          SELECT a.width, a.height, b.sig AS sig,
            a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(a.sig = b.sig AS INT) AS sig_match,
            ROUND(
              list_sum(list_transform(list_zip(a.v, b.v),
                                      p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
               sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)
              AS cos_sim
          FROM fz a JOIN fz b
            ON a.width = b.width AND a.height = b.height
            AND a.doc_id < b.doc_id
            AND bit_count(xor(a.sig, b.sig)) <= 1)
        SELECT width, height, sig, doc_a, doc_b, sig_match, cos_sim,
          CAST(cos_sim >= 0.999 AS INT) AS is_dup
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY width, height, sig
            ORDER BY cos_sim DESC, doc_a, doc_b) AS rn
          FROM pairs)
        WHERE rn = 1
        ORDER BY width, height, sig""")),
    // ----------------------------------------------------------------
    Q(
      "m08_perceptual_keepers",
      (s, dir) =>
        // The multimodal KEEP/DROP verdict (see [[perceptualKeepers]]):
        // d17's keep-best discipline over m07's Hamming-≤1 families —
        // largest payload wins its family. The oracle restates the
        // edges INDEPENDENTLY (bit_count(xor) ≤ 1 on dims-equal
        // pairs, no multi-probe) and the same one-hop min + argmax.
        perceptualKeepers(
          decodedFrame(s, dir)
            .select(col("doc_id"), col("width"), col("height"),
              col("n_bytes"), col("v")))
          .orderBy("doc_id"),
      Some(s"""
        WITH $sqlDecodeAcc,
        f AS (
          SELECT doc_id, n_bytes,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height,
            $sqlFeatsList AS v,
            CAST($sqlSigExpr AS INT) AS sig
          FROM acc),
        fz AS (
          SELECT * FROM f
          WHERE list_sum(list_transform(v, x -> x * x)) > 0),
        edges AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM fz a JOIN fz b
            ON a.width = b.width AND a.height = b.height
            AND a.doc_id < b.doc_id
            AND bit_count(xor(a.sig, b.sig)) <= 1
          WHERE ROUND(
              list_sum(list_transform(list_zip(a.v, b.v),
                                      p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
               sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)
            >= 0.999),
        nbr AS (
          SELECT doc_id, MIN(nbr) AS nbr_min FROM (
            SELECT doc_a AS doc_id, doc_b AS nbr FROM edges
            UNION ALL
            SELECT doc_b AS doc_id, doc_a AS nbr FROM edges)
          GROUP BY doc_id),
        fam AS (
          SELECT f.doc_id, f.n_bytes,
            LEAST(f.doc_id, COALESCE(n.nbr_min, f.doc_id)) AS family
          FROM f LEFT JOIN nbr n USING (doc_id))
        SELECT doc_id, family, n_bytes,
          CAST(ROW_NUMBER() OVER (
            PARTITION BY family
            ORDER BY n_bytes DESC, doc_id) = 1 AS INT) AS is_kept
        FROM fam
        ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m09_perceptual_decontamination",
      (s, dir) =>
        // Multimodal eval-leak gate (see [[perceptualDecontaminate]]):
        // training blobs whose DECODED representation near-dups a
        // doc_id%23 eval blob ((dims, sig) within Hamming 1, cosine
        // ≥ 0.999) are flagged — the d20 discipline where the tiny
        // probed side broadcasts and the corpus never shuffles. The
        // oracle restates the match INDEPENDENTLY: bit_count(xor) ≤ 1
        // on dims-equal (train, eval) pairs, no multi-probe.
        perceptualDecontaminate(decodedFrame(s, dir)),
      Some(s"""
        WITH $sqlDecodeAcc,
        f AS (
          SELECT doc_id,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height,
            $sqlFeatsList AS v,
            CAST($sqlSigExpr AS INT) AS sig
          FROM acc),
        fz AS (
          SELECT * FROM f
          WHERE list_sum(list_transform(v, x -> x * x)) > 0),
        hits AS (
          SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
          FROM fz t JOIN fz e
            ON t.width = e.width AND t.height = e.height
            AND t.doc_id % 23 <> 0 AND e.doc_id % 23 = 0
            AND bit_count(xor(t.sig, e.sig)) <= 1
          WHERE ROUND(
              list_sum(list_transform(list_zip(t.v, e.v),
                                      p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(t.v, x -> x * x))) *
               sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6)
            >= 0.999),
        ne AS (
          SELECT doc_id, COUNT(*) AS n_eval_hits
          FROM hits GROUP BY doc_id)
        SELECT f.doc_id, COALESCE(ne.n_eval_hits, 0) AS n_eval_hits,
          CAST(COALESCE(ne.n_eval_hits, 0) = 0 AS INT) AS is_kept
        FROM f LEFT JOIN ne ON f.doc_id = ne.doc_id
        WHERE f.doc_id % 23 <> 0
        ORDER BY f.doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m10_multimodal_admission",
      (s, dir) => {
        // Multimodal ADMISSION GATE — p08's verdict discipline over
        // the binary tier, composing the three payload gates in the
        // order a multimodal curation run applies them: m09 eval
        // decontamination ≻ m08 perceptual dedup ≻ decoded-size
        // floor (min side ≥ 32 px — the tiny-image drop LAION-class
        // pipelines apply). Precedence attributes loss to the gate
        // that MUST fire: a leaked eval near-dup reports as
        // contaminated even when it is also someone's duplicate.
        // The keeper election runs over the TRAINING slice only —
        // eval blobs are not corpus candidates, so a training blob
        // must not lose its family to one. Scale shape: both signal
        // operators reduce to one row per blob off the SHARED
        // memoized decoded frame (one decode for the whole gate);
        // the verdict joins carry (doc_id, flag) rows only.
        multimodalAdmission(decodedFrame(s, dir))
      },
      // Independent restatement: decontamination is an EXISTS over
      // dims-equal bit_count(xor) ≤ 1 pairs (no multi-probe); the
      // keeper election is m08's edges/family/argmax over the
      // training slice only.
      Some(s"""
        WITH $sqlDecodeAcc,
        f AS (
          SELECT doc_id, n_bytes,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height,
            $sqlFeatsList AS v,
            CAST($sqlSigExpr AS INT) AS sig
          FROM acc),
        fz AS (
          SELECT * FROM f
          WHERE list_sum(list_transform(v, x -> x * x)) > 0),
        dh AS (
          SELECT DISTINCT t.doc_id
          FROM fz t JOIN fz e
            ON t.width = e.width AND t.height = e.height
            AND t.doc_id % 23 <> 0 AND e.doc_id % 23 = 0
            AND bit_count(xor(t.sig, e.sig)) <= 1
          WHERE ROUND(
              list_sum(list_transform(list_zip(t.v, e.v),
                                      p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(t.v, x -> x * x))) *
               sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6)
            >= 0.999),
        tf AS (SELECT * FROM f WHERE doc_id % 23 <> 0),
        tfz AS (SELECT * FROM fz WHERE doc_id % 23 <> 0),
        edges AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM tfz a JOIN tfz b
            ON a.width = b.width AND a.height = b.height
            AND a.doc_id < b.doc_id
            AND bit_count(xor(a.sig, b.sig)) <= 1
          WHERE ROUND(
              list_sum(list_transform(list_zip(a.v, b.v),
                                      p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
               sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)
            >= 0.999),
        nbr AS (
          SELECT doc_id, MIN(nbr) AS nbr_min FROM (
            SELECT doc_a AS doc_id, doc_b AS nbr FROM edges
            UNION ALL
            SELECT doc_b AS doc_id, doc_a AS nbr FROM edges)
          GROUP BY doc_id),
        fam AS (
          SELECT t.doc_id, t.n_bytes,
            LEAST(t.doc_id, COALESCE(n.nbr_min, t.doc_id)) AS family
          FROM tf t LEFT JOIN nbr n USING (doc_id)),
        keep AS (
          SELECT doc_id,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY family
              ORDER BY n_bytes DESC, doc_id) = 1 AS INT) AS keeper_ok
          FROM fam)
        SELECT t.doc_id, t.width, t.height, t.n_bytes,
          CAST(dh.doc_id IS NULL AS INT) AS decon_ok,
          k.keeper_ok,
          CAST(LEAST(t.width, t.height) >= 32 AS INT) AS size_ok,
          CASE WHEN dh.doc_id IS NOT NULL THEN 'contaminated'
               WHEN k.keeper_ok = 0 THEN 'duplicate'
               WHEN LEAST(t.width, t.height) < 32 THEN 'too_small'
               ELSE 'admitted' END AS verdict
        FROM tf t
        LEFT JOIN dh ON t.doc_id = dh.doc_id
        JOIN keep k ON k.doc_id = t.doc_id
        ORDER BY t.doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m11_modality_disagreement",
      (s, dir) => {
        // CROSS-MODAL dedup agreement audit: the same corpus judged
        // by both near-dup tiers — d11's text SimHash (Hamming ≤ 3
        // banding) and m07's perceptual gate (dims + sign-code
        // Hamming ≤ 1, cosine ≥ 0.999) — full-outer-joined on the
        // pair, with the quadrant verdict a curator reads before
        // trusting either tier alone: 'both' (drop safely),
        // 'text_only' (same prose, different payload — e.g. two
        // images under one caption; dropping loses a modality),
        // 'visual_only' (same image recaptioned — the sneaky dup
        // text dedup can't see). With the STUB decoder the payload
        // IS the text bytes, so visual_only is structurally empty
        // here (spec-pinned invariant); a real decoder makes it the
        // interesting quadrant and nothing in the plan changes.
        // Scale shape: both pair enumerators are the banded/blocked
        // originals; the agreement join is pairs-vs-pairs — bounded
        // by the dup sets, not the corpus.
        val text = Dedup.simhashNearDup(
            Tables.load(s, dir, "documents"), maxHamming = 3)
          .select(col("doc_a"), col("doc_b"), lit(1).as("text_dup"))
        val vis = perceptualPairs(
            decodedFrame(s, dir)
              .select(col("doc_id"), col("width"), col("height"),
                col("v")))
          .filter(col("cos_sim") >= 0.999)
          .select(col("doc_a"), col("doc_b"), lit(1).as("visual_dup"))
        text.join(vis, Seq("doc_a", "doc_b"), "full")
          .select(col("doc_a"), col("doc_b"),
            coalesce(col("text_dup"), lit(0)).as("text_dup"),
            coalesce(col("visual_dup"), lit(0)).as("visual_dup"),
            when(col("text_dup").isNotNull && col("visual_dup").isNotNull,
              "both")
              .when(col("text_dup").isNotNull, "text_only")
              .otherwise("visual_only").as("verdict"))
          .orderBy("doc_a", "doc_b")
      },
      Some(Dedup.sqlSimhashBandsCte("WHERE text IS NOT NULL") + s""",
        $sqlDecodeAcc,
        f AS (
          SELECT doc_id,
            CAST(16 + (hv % 16) * 16 AS INT) AS width,
            CAST(16 + ((hv // 16) % 16) * 16 AS INT) AS height,
            $sqlFeatsList AS v,
            CAST($sqlSigExpr AS INT) AS sig
          FROM acc),
        fz AS (
          SELECT * FROM f
          WHERE list_sum(list_transform(v, x -> x * x)) > 0),
        vp AS (
          SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              ROUND(
                list_sum(list_transform(list_zip(a.v, b.v),
                                        p -> p[1] * p[2])) /
                (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
                 sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)
                AS cos_sim
            FROM fz a JOIN fz b
              ON a.width = b.width AND a.height = b.height
              AND a.doc_id < b.doc_id
              AND bit_count(xor(a.sig, b.sig)) <= 1)
          WHERE cos_sim >= 0.999),
        tp AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
          WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) <= 3)
        SELECT COALESCE(t.doc_a, v.doc_a) AS doc_a,
          COALESCE(t.doc_b, v.doc_b) AS doc_b,
          CAST(t.doc_a IS NOT NULL AS INT) AS text_dup,
          CAST(v.doc_a IS NOT NULL AS INT) AS visual_dup,
          CASE
            WHEN t.doc_a IS NOT NULL AND v.doc_a IS NOT NULL THEN 'both'
            WHEN t.doc_a IS NOT NULL THEN 'text_only'
            ELSE 'visual_only' END AS verdict
        FROM tp t FULL JOIN vp v
          ON t.doc_a = v.doc_a AND t.doc_b = v.doc_b
        ORDER BY doc_a, doc_b""")),
    // ----------------------------------------------------------------
    Q(
      "m12_scene_detect",
      (s, dir) =>
        // Scene-change detection over m03's sampled frame track: each
        // payload's frames (64-char chunks at stride 192) reduce to a
        // 28-bit luma proxy (md5 prefix — deterministic stand-in for
        // a mean-luminance decode), and a boundary fires wherever two
        // ADJACENT samples differ by more than half the feature range
        // — the classic frame-differencing cut detector. Everything
        // is per-row array arithmetic (transform/filter HOFs): zero
        // shuffle, zero explode — at 100 TB scene detection is a
        // map-only pass whose cost is the scan itself, and the frame
        // arrays never become rows. The boundary list ships as one
        // digest + count, not exploded rows.
        sceneDetect(Tables.load(s, dir, "documents")),
      Some("""
        WITH f AS (
          SELECT doc_id,
            list_transform(range(0, (greatest(length(text), 1) - 1) // 192 + 1),
              i -> CAST('0x' || substr(
                     md5(substr(text, CAST(i*192 + 1 AS INT), 64)),
                     1, 7) AS BIGINT)) AS feats
          FROM documents),
        b AS (
          SELECT doc_id, feats,
            list_filter(range(1, len(feats)),
              i -> abs(feats[i + 1] - feats[i]) > 134217728) AS bounds
          FROM f)
        SELECT doc_id, CAST(len(feats) AS INT) AS n_frames,
          CAST(len(bounds) + 1 AS INT) AS n_scenes,
          -- array_to_string([]) is NULL in DuckDB (not ''): COALESCE
          -- pins the zero-boundary digest to md5('') like Spark's
          -- concat_ws.
          md5(COALESCE(array_to_string(
            list_transform(bounds, x -> CAST(x AS VARCHAR)), ','), ''))
            AS bounds_digest
        FROM b ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m13_silence_runs",
      (s, dir) =>
        // Silence-run detection (see [[silenceRuns]]): Spark scans
        // each payload's flag array with ONE sequential fold; the
        // oracle recounts the same runs via unnest +
        // gaps-and-islands — two independent run-length
        // formulations, one hash.
        silenceRuns(Tables.load(s, dir, "documents")),
      Some("""
        WITH f AS (
          SELECT doc_id,
            list_transform(range(0, (greatest(length(text), 1) - 1) // 192 + 1),
              i -> CAST('0x' || substr(
                     md5(substr(text, CAST(i*192 + 1 AS INT), 64)),
                     1, 7) AS BIGINT)) AS feats
          FROM documents),
        fr AS (
          SELECT doc_id, u.i AS idx, u.v AS v
          FROM f, unnest(list_transform(range(1, len(feats) + 1),
                         i -> {'i': i, 'v': feats[i]})) AS s(u)),
        sil AS (
          SELECT doc_id, idx,
            idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY idx) AS isl
          FROM fr WHERE v < 67108864),
        runs AS (
          SELECT doc_id, isl, COUNT(*) AS runlen
          FROM sil GROUP BY doc_id, isl),
        ra AS (
          SELECT doc_id, COUNT(*) AS n_runs, MAX(runlen) AS longest
          FROM runs GROUP BY doc_id),
        base AS (
          SELECT doc_id, CAST(len(feats) AS INT) AS n_frames,
            CAST(len(list_filter(feats, x -> x < 67108864)) AS INT)
              AS n_silent
          FROM f)
        SELECT b.doc_id, b.n_frames, b.n_silent,
          CAST(COALESCE(ra.n_runs, 0) AS INT) AS n_runs,
          CAST(COALESCE(ra.longest, 0) AS INT) AS longest_run
        FROM base b LEFT JOIN ra ON b.doc_id = ra.doc_id
        ORDER BY b.doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m14_silence_trim",
      (s, dir) =>
        // Silence-trim execution (see [[silenceTrim]]): m13's silent
        // frames removed in place, the surviving track digested
        // order-exactly.
        silenceTrim(Tables.load(s, dir, "documents")),
      Some("""
        WITH f AS (
          SELECT doc_id,
            list_transform(range(0, (greatest(length(text), 1) - 1) // 192 + 1),
              i -> md5(substr(text, CAST(i*192 + 1 AS INT), 64))) AS ds
          FROM documents),
        k AS (
          SELECT doc_id, len(ds) AS n_frames,
            list_filter(ds, d ->
              CAST('0x' || substr(d, 1, 7) AS BIGINT) >= 67108864)
              AS kept
          FROM f)
        SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
          CAST(len(kept) AS INT) AS n_kept,
          -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
          -- concat_ws over an empty array is '' — pin the fully-
          -- trimmed track to md5('') in both engines.
          md5(COALESCE(array_to_string(kept, ''), '')) AS trim_digest
        FROM k ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m15_wav_decode",
      (s, dir) => {
        // The family's ONE honest end-to-end decode (r17 verdict):
        // a REAL RIFF/WAVE PCM container is built around each
        // document's bytes (every 3rd with an extra LIST chunk, so
        // fixed-offset "parsing" would misread exactly those rows),
        // then [[WavCodec.parse]] walks the chunk list byte-for-byte
        // and the integer-exact features come off the DECODED
        // samples. The oracle recomputes the same features straight
        // from the document bytes — the hash match proves the
        // container round trip (header, chunk walk, alignment pads,
        // LE sample decode) lossless, not just the arithmetic.
        // Same mapPartitions batch boundary as m02; a Left here is
        // a builder/parser drift and must be LOUD, never a row.
        val spark = s
        import spark.implicits._
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          .filter(col("payload").isNotNull)
          .as[Blob]
          .mapPartitions(_.grouped(64).flatMap(_.map { b =>
            val wav = WavCodec.build(b.payload,
              withJunk = b.doc_id % 3 == 0)
            WavCodec.parse(wav) match {
              case Right(w) =>
                val (n, peak, sumAbs, zc) = WavCodec.features(w)
                WavRow(b.doc_id, w.nChannels, w.sampleRate,
                  n, peak, sumAbs, zc)
              case Left(err) => throw new IllegalStateException(
                s"m15: doc ${b.doc_id} failed to decode: $err")
            }
          }))
          .toDF()
          .orderBy("doc_id")
      },
      // Samples are the text's UTF-8 byte pairs as LE int16 (odd
      // trailing byte dropped); all features integer folds.
      Some("""
        WITH hx AS (
          SELECT doc_id, octet_length(encode(text)) AS nb,
            hex(encode(text)) AS h
          FROM documents WHERE text IS NOT NULL),
        sm AS (
          SELECT doc_id,
            list_transform(
              list_transform(range(0, CAST(nb // 2 AS BIGINT)),
                i -> CAST(('0x' || substr(h, CAST(4*i + 1 AS INT), 2))
                       AS INT)
                   + 256 * CAST(('0x' || substr(h, CAST(4*i + 3 AS INT),
                       2)) AS INT)),
              u -> CASE WHEN u >= 32768 THEN u - 65536 ELSE u END) AS v
          FROM hx)
        SELECT doc_id,
          CAST(1 AS INT) AS n_channels,
          CAST(8000 AS INT) AS sample_rate,
          CAST(len(v) AS BIGINT) AS n_samples,
          CAST(COALESCE(list_max(list_transform(v, x -> abs(x))), 0)
            AS BIGINT) AS peak,
          CAST(COALESCE(list_sum(list_transform(v, x -> abs(x))), 0)
            AS BIGINT) AS sum_abs,
          CAST(COALESCE(list_sum(list_transform(range(1, len(v)),
            i -> CASE WHEN (v[i] < 0) <> (v[i+1] < 0) THEN 1 ELSE 0
                 END)), 0) AS BIGINT) AS zero_crossings
        FROM sm ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m16_bmp_decode",
      (s, dir) => {
        // The image tier's honest end-to-end decode (r18 verdict —
        // m15's pattern applied to the perceptual family's
        // container): a REAL uncompressed 24-bit BMP is built around
        // each document's bytes — every 3rd row-order-flipped
        // (top-down, negative height) and every 5th with a junk gap
        // before the pixel array (bfOffBits > 54), so a parser that
        // hard-coded the canonical layout, ignored the height sign,
        // or assumed offset 54 would misread exactly those rows —
        // then [[BmpCodec.parse]] reads the headers byte-for-byte,
        // honors the row STRIDE padding (width 25 ⇒ 75-byte rows
        // padded to 76), and the integer-exact features come off the
        // reconstructed LOGICAL pixel grid. The oracle recomputes the
        // same features straight from the document bytes — the hash
        // match proves the container round trip (headers, offset,
        // stride, row-order normalization, channel order) lossless.
        // Same mapPartitions batch boundary as m02/m15; a Left here
        // is a builder/parser drift and must be LOUD, never a row.
        val spark = s
        import spark.implicits._
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          .filter(col("payload").isNotNull)
          .as[Blob]
          .mapPartitions(_.grouped(64).flatMap(_.map { b =>
            val bmp = BmpCodec.build(b.payload,
              topDown = b.doc_id % 3 == 0,
              gap = if (b.doc_id % 5 == 0) 16 else 0)
            BmpCodec.parse(bmp) match {
              case Right(img) =>
                val (sb, sg, sr, ws) = BmpCodec.features(img)
                BmpRow(b.doc_id, img.width, img.height, sb, sg, sr, ws)
              case Left(err) => throw new IllegalStateException(
                s"m16: doc ${b.doc_id} failed to decode: $err")
            }
          }))
          .toDF()
          .orderBy("doc_id")
      },
      // Pixels are the text's UTF-8 bytes row-major at width 25
      // (trailing partial row dropped; short docs zero-padded — zeros
      // are feature-inert); byte i is pixel i//3 channel i%3 (B,G,R),
      // at x=(i//3)%25, y=(i//3)//25. All features integer folds.
      Some("""
        WITH hx AS (
          SELECT doc_id, octet_length(encode(text)) AS nb,
            hex(encode(text)) AS h
          FROM documents WHERE text IS NOT NULL),
        dims AS (
          SELECT doc_id, h,
            GREATEST(nb // 75, 1) AS ht,
            LEAST(nb, 75 * GREATEST(nb // 75, 1)) AS used
          FROM hx),
        px AS (
          SELECT doc_id, ht,
            list_transform(range(0, used),
              i -> {'v': CAST(('0x' || substr(h, CAST(2*i + 1 AS INT),
                       2)) AS INT),
                    'x': (i // 3) % 25,
                    'y': (i // 3) // 25,
                    'c': i % 3}) AS ps
          FROM dims)
        SELECT doc_id,
          CAST(25 AS INT) AS width,
          CAST(ht AS INT) AS height,
          CAST(COALESCE(list_sum(list_transform(
            list_filter(ps, p -> p.c = 0), p -> p.v)), 0) AS BIGINT)
            AS sum_b,
          CAST(COALESCE(list_sum(list_transform(
            list_filter(ps, p -> p.c = 1), p -> p.v)), 0) AS BIGINT)
            AS sum_g,
          CAST(COALESCE(list_sum(list_transform(
            list_filter(ps, p -> p.c = 2), p -> p.v)), 0) AS BIGINT)
            AS sum_r,
          CAST(COALESCE(list_sum(list_transform(ps, p ->
            (p.y + 1) * (p.x + 1) *
            (CASE p.c WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) * p.v)),
            0) AS BIGINT) AS wsum
        FROM px ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "m17_perceptual_ahash",
      (s, dir) => {
        // The perceptual family made honest end to end (the r18
        // verdict's arc): m07/m08's perceptual signature was a
        // byte-hash stand-in behind fakeDecodeBatch; here the aHash
        // comes off the REAL [[BmpCodec]] decode — container parse,
        // row-order normalization, stride removal, THEN the 8x8
        // sample/threshold — and the oracle recomputes the identical
        // integer pipeline straight from the document bytes, so the
        // hash match certifies decode + perceptual signature
        // together. Same layout variants and mapPartitions batch
        // boundary as m16; a Left is LOUD.
        val spark = s
        import spark.implicits._
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"))
          .filter(col("payload").isNotNull)
          .as[Blob]
          .mapPartitions(_.grouped(64).flatMap(_.map { b =>
            val bmp = BmpCodec.build(b.payload,
              topDown = b.doc_id % 3 == 0,
              gap = if (b.doc_id % 5 == 0) 16 else 0)
            BmpCodec.parse(bmp) match {
              case Right(img) =>
                val (mean, lo, hi) = BmpCodec.ahash(img)
                AhashRow(b.doc_id, mean, lo, hi)
              case Left(err) => throw new IllegalStateException(
                s"m17: doc ${b.doc_id} failed to decode: $err")
            }
          }))
          .toDF()
          .orderBy("doc_id")
      },
      // Same pixel mapping as m16 (width 25, byte i → pixel i//3,
      // channel i%3); luma = B + 2G + 4R at the 8x8 sample points
      // (y = gy*H//8, x = gx*25//8), mean-thresholded into two
      // 32-bit halves (bit 63 in a signed BIGINT would hinge on
      // shift-overflow semantics — the split avoids the class).
      // Samples beyond a short doc's bytes are the builder's zero
      // padding in BOTH engines.
      Some("""
        WITH hx AS (
          SELECT doc_id, octet_length(encode(text)) AS nb,
            hex(encode(text)) AS h
          FROM documents WHERE text IS NOT NULL),
        dims AS (
          SELECT doc_id, h, nb, GREATEST(nb // 75, 1) AS ht
          FROM hx),
        bs AS (
          SELECT doc_id, h, nb,
            list_transform(range(0, 64), k ->
              ((((k // 8) * ht) // 8) * 25 + ((k % 8) * 25) // 8) * 3)
              AS bases
          FROM dims),
        lm AS (
          SELECT doc_id,
            list_transform(bases, b ->
                (CASE WHEN b < nb THEN CAST('0x' ||
                   substr(h, CAST(2*b + 1 AS INT), 2) AS BIGINT)
                 ELSE 0 END)
              + 2 * (CASE WHEN b + 1 < nb THEN CAST('0x' ||
                   substr(h, CAST(2*b + 3 AS INT), 2) AS BIGINT)
                 ELSE 0 END)
              + 4 * (CASE WHEN b + 2 < nb THEN CAST('0x' ||
                   substr(h, CAST(2*b + 5 AS INT), 2) AS BIGINT)
                 ELSE 0 END)) AS ls
          FROM bs),
        mv AS (
          SELECT doc_id, ls,
            CAST(list_sum(ls) // 64 AS BIGINT) AS mean
          FROM lm)
        SELECT doc_id, mean AS mean_luma,
          CAST(COALESCE(list_sum(list_transform(range(0, 32), k ->
            CASE WHEN ls[CAST(k + 1 AS INT)] > mean
              THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)), 0)
            AS BIGINT) AS h_lo,
          CAST(COALESCE(list_sum(list_transform(range(32, 64), k ->
            CASE WHEN ls[CAST(k + 1 AS INT)] > mean
              THEN (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)), 0)
            AS BIGINT) AS h_hi
        FROM mv ORDER BY doc_id"""))
  )

  /** m16 output row: logical dimensions + integer-exact pixel
    * features off the decoded grid.
    */
  final case class BmpRow(
      doc_id: Long,
      width: Int,
      height: Int,
      sum_b: Long,
      sum_g: Long,
      sum_r: Long,
      wsum: Long)

  /** m17 output row: sample-grid mean luma + the 64-bit aHash split
    * into two non-negative 32-bit halves.
    */
  final case class AhashRow(
      doc_id: Long,
      mean_luma: Long,
      h_lo: Long,
      h_hi: Long)

  /** m15 output row: header fields + integer-exact sample features. */
  final case class WavRow(
      doc_id: Long,
      n_channels: Int,
      sample_rate: Int,
      n_samples: Long,
      peak: Long,
      sum_abs: Long,
      zero_crossings: Long)
}
