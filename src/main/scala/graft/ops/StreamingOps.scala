package graft.ops

import graft.streaming.{DocumentStream, EmbeddingStream, EventStream}

/** Streaming entries in the query surface. st01 runs a REAL
  * Structured Streaming query (readStream → watermark → windowed agg
  * → memory sink, AvailableNow trigger) whose final result is
  * oracle-checked against the same SQL as the batch path — the
  * unified-API guarantee, made checkable.
  */
object StreamingOps {

  /** st22/st27's shared fixpoint oracle: the surviving vector set
    * (every 7th negated by its re-upsert, every 9th deleted),
    * frozen-centroid assignment, saturating grid encode, and the
    * two-probe integer-SQ8 search — stated with no stream (and no
    * persistence) anywhere. st22 must reach it through the state
    * machine; st27 through the state machine PLUS the disk round
    * trip, so one SQL string proves both compositions lossless.
    */
  private val sqlIndexFixpoint: String = """
        WITH e AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE embedding IS NOT NULL),
        cdims AS (
          SELECT label, CAST(u.i AS INT) AS dim, u.x AS x
          FROM e, unnest(list_transform(range(1, len(v) + 1),
                                        i -> {'i': i, 'x': v[i]})) AS s(u)),
        cent AS (
          SELECT label, list(cx ORDER BY dim) AS cv FROM (
            SELECT label, dim,
              CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cx
            FROM cdims GROUP BY label, dim)
          GROUP BY label),
        gdims AS (
          SELECT CAST(u.i - 1 AS INT) AS dim, u.x AS x
          FROM e, unnest(list_transform(range(1, len(v) + 1),
                         i -> {'i': i, 'x': v[i]})) AS s(u)),
        stats AS (
          SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM gdims GROUP BY dim),
        grid AS (
          SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his
          FROM stats),
        eff AS (
          SELECT vec_id,
            CASE WHEN vec_id % 7 = 0
                 THEN list_transform(v, x -> -x) ELSE v END AS v
          FROM e WHERE vec_id % 9 <> 0),
        acell AS (
          SELECT vec_id, v, cell FROM (
            SELECT f.vec_id, f.v, c.label AS cell,
              ROW_NUMBER() OVER (PARTITION BY f.vec_id ORDER BY
                (list_sum(list_transform(list_zip(f.v, c.cv), p -> p[1]*p[2])) /
                 (sqrt(list_sum(list_transform(f.v, x -> x*x))) *
                  sqrt(list_sum(list_transform(c.cv, x -> x*x))))) DESC,
                c.label) AS rn
            FROM eff f CROSS JOIN cent c) WHERE rn = 1),
        codes AS (
          SELECT vec_id, cell,
            list_transform(range(1, len(v) + 1), i ->
              CAST(LEAST(GREATEST(FLOOR(
                CASE WHEN his[i] = los[i] THEN 0.0
                ELSE (v[i] - los[i]) * 255.0 / (his[i] - los[i]) END
                + 0.5), 0.0), 255.0) AS INT)) AS c
          FROM acell, grid),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
        probe AS (
          SELECT qid, label AS probe_label FROM (
            SELECT q.qid, c.label,
              ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                (list_sum(list_transform(list_zip(q.qv, c.cv), p -> p[1]*p[2])) /
                 (sqrt(list_sum(list_transform(q.qv, x -> x*x))) *
                  sqrt(list_sum(list_transform(c.cv, x -> x*x))))) DESC,
                c.label) AS rn
            FROM q CROSS JOIN cent c) WHERE rn <= 2),
        qc AS (
          SELECT qid,
            list_transform(range(1, len(qv) + 1), i ->
              CAST(FLOOR(CASE WHEN his[i] = los[i] THEN 0.0
                ELSE (qv[i] - los[i]) * 255.0 / (his[i] - los[i]) END
                + 0.5) AS INT)) AS qc
          FROM q, grid),
        scored AS (
          SELECT p.qid, p.probe_label, k.vec_id,
            CAST(list_sum(list_transform(list_zip(qc.qc, k.c),
              pr -> CAST(pr[1] - pr[2] AS BIGINT)
                    * CAST(pr[1] - pr[2] AS BIGINT))) AS BIGINT) AS idist
          FROM codes k
          JOIN probe p ON k.cell = p.probe_label AND k.vec_id <> p.qid
          JOIN qc ON qc.qid = p.qid)
        SELECT qid, probe_label, vec_id, idist, rnk FROM (
          SELECT qid, probe_label, vec_id, idist,
            ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY idist, vec_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        ORDER BY qid, rnk"""

  val all: Seq[Q] = Seq(
    Q(
      "st01_stream_hourly",
      (s, dir) => EventStream.runHourly(s, dir),
      Some("""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2""")),
    // ------------------------------------------------------------------
    Q(
      "st02_stream_sessions",
      (s, dir) => EventStream.runSessions(s, dir),
      // Closed sessions = every (user, session) except each user's
      // LAST session (gap rule: >= 30 min to the next event closes,
      // µs precision), PLUS the last session where the final watermark
      // passed its end: EventTimeTimeout fires on strict
      // `lastSeen_ms + 30 min < watermark_ms`, with watermark_ms =
      // floor(max µs over ALL events / 1000) − 1 h (Spark floors event
      // times to ms before the max) — emitting AND evicting the state.
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        wm AS (
          SELECT MAX(us) // 1000 - 3600000 AS wms FROM e),
        g AS (
          SELECT user_id, us, event_id,
            CASE WHEN us - LAG(us, 1) OVER (PARTITION BY user_id
                                            ORDER BY us, event_id)
                      >= 1800000000
                 THEN 1 ELSE 0 END AS brk
          FROM e),
        s AS (
          SELECT user_id, us,
            SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM g),
        sess AS (
          SELECT user_id, sid, COUNT(*) AS n_events, MAX(us) AS last_us
          FROM s GROUP BY user_id, sid)
        SELECT user_id, n_events, TRUE AS closed
        FROM sess, wm
        WHERE sid < (SELECT MAX(s2.sid) FROM sess s2
                     WHERE s2.user_id = sess.user_id)
           OR last_us // 1000 + 1800000 < wm.wms
        ORDER BY user_id, n_events""")),
    // ------------------------------------------------------------------
    Q(
      "st13_stream_session_window",
      (s, dir) => EventStream.runSessionWindows(s, dir),
      // Native session_window, Append mode: a session emits iff its
      // window end (last event + 30 min) is at or before the final
      // watermark, wm_µs = (floor(max_µs/1000) − 1 h) × 1000 (Spark
      // floors event times to ms for watermark tracking, then the
      // eviction predicate compares µs). Session identity = the same
      // 30-min-gap grouping as st02's CTE chain; start = MIN(us).
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        wm AS (
          SELECT (MAX(us) // 1000 - 3600000) * 1000 AS wus FROM e),
        g AS (
          SELECT user_id, us, event_id,
            CASE WHEN us - LAG(us, 1) OVER (PARTITION BY user_id
                                            ORDER BY us, event_id)
                      >= 1800000000
                 THEN 1 ELSE 0 END AS brk
          FROM e),
        s AS (
          SELECT user_id, us,
            SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM g),
        sess AS (
          SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS last_us,
            COUNT(*) AS n_events
          FROM s GROUP BY user_id, sid)
        SELECT user_id, make_timestamp(start_us) AS session_start,
          n_events
        FROM sess, wm
        WHERE last_us + 1800000000 <= wm.wus
        ORDER BY user_id, session_start""")),
    // ------------------------------------------------------------------
    Q(
      "st03_stream_interval_join",
      (s, dir) => EventStream.runIntervalJoin(s, dir),
      Some("""
        SELECT p.event_id AS purchase_id, p.user_id,
          CAST(p.ts AS TIMESTAMP) AS ts,
          v.event_id AS view_event_id,
          CAST(v.ts AS TIMESTAMP) AS view_ts
        FROM events p JOIN events v
          ON p.user_id = v.user_id
         AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         AND CAST(v.ts AS TIMESTAMP) >=
             CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        ORDER BY purchase_id, view_event_id""")),
    // ------------------------------------------------------------------
    Q(
      "st05_stream_running_counts",
      (s, dir) => EventStream.runRunningCounts(s, dir),
      Some("""
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),
    // ------------------------------------------------------------------
    Q(
      "st04_stream_dedup",
      (s, dir) => EventStream.runStreamDedup(s, dir),
      Some("""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type""")),
    // ------------------------------------------------------------------
    Q(
      "st06_stream_static_join",
      (s, dir) => EventStream.runStaticEnriched(s, dir),
      Some("""
        SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
          CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
        ORDER BY 1, 2""")),
    // ------------------------------------------------------------------
    Q(
      "st08_stream_file_sink",
      (s, dir) => EventStream.runForeachBatchSink(s, dir),
      Some("""
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),
    // ------------------------------------------------------------------
    Q(
      "st07_stream_simhash_dedup",
      (s, dir) => DocumentStream.runStreamNearDupUnbounded(s, dir),
      // The streaming run of d11's operator must converge to the
      // identical pair set — same oracle SQL, by construction.
      // Deliberately the UNBOUNDED reference variant: whole-history
      // equivalence is the property under test. Production ingest is
      // st11's TTL'd entry.
      Some(Dedup.sqlSimhashNearDup)),
    // ------------------------------------------------------------------
    Q(
      "st10_stream_chained_windows",
      (s, dir) => EventStream.runTwoLevelWindow(s, dir),
      // Append mode emits only days FINALIZED by the watermark: day
      // end <= max(ts) - 1 hour. The oracle restricts the batch daily
      // rollup to exactly those days — watermark semantics stated in
      // SQL.
      Some("""
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS mts, event_type
                   FROM events),
        wm AS (SELECT MAX(mts) - INTERVAL 1 HOUR AS w FROM e)
        SELECT date_trunc('day', mts) AS day, event_type,
          COUNT(*) AS n
        FROM e, wm
        GROUP BY 1, 2, wm.w
        HAVING date_trunc('day', MIN(mts)) + INTERVAL 1 DAY <= wm.w
        ORDER BY day, event_type""")),
    // ------------------------------------------------------------------
    Q(
      "st09_stream_admission",
      (s, dir) => DocumentStream.runStreamAdmissionUnbounded(s, dir),
      // Gate → near-dup → admit/reject: rejected iff an EARLIER gated
      // doc sits within Hamming ≤ 3 in a shared band bucket. The
      // signature CTEs compose from the one shared definition.
      // Deliberately the UNBOUNDED reference variant (whole-history
      // equivalence); production ingest is st12's TTL'd entry.
      Some(Dedup.sqlSimhashBandsCte(
        gate = "WHERE text IS NOT NULL AND n_chars >= 100") + """,
        rejected AS (
          SELECT DISTINCT b.doc_id
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
          WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) <= 3)
        SELECT t.doc_id,
          CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END AS admitted
        FROM toks t LEFT JOIN rejected r USING (doc_id)
        ORDER BY t.doc_id""")),
    // ------------------------------------------------------------------
    Q(
      "st11_stream_simhash_ttl",
      (s, dir) => DocumentStream.runStreamNearDupTtl(s, dir),
      // TTL'd st07: state bounded to the 120 s event-time horizon
      // (event_ts = epoch + doc_id sec), so the pair set is batch d11
      // restricted to arrivals within the horizon — the constant-
      // memory continuous-ingest semantics, stated as doc_id
      // arithmetic.
      Some(Dedup.sqlSimhashBandsCte("WHERE text IS NOT NULL") + """
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) AS INT)
            AS hamming
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 120
        WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) <= 3
        ORDER BY doc_a, doc_b""")),
    // ------------------------------------------------------------------
    Q(
      "st12_stream_admission_ttl",
      (s, dir) => DocumentStream.runStreamAdmissionTtl(s, dir),
      // st09's admission pipeline with BOUNDED state: rejected iff an
      // earlier gated doc within the 120 s event-time horizon
      // (event_ts = epoch + doc_id sec → plain doc_id arithmetic)
      // sits at Hamming ≤ 3 in a shared band bucket. The signature
      // CTEs compose from the one shared definition.
      Some(Dedup.sqlSimhashBandsCte(
        gate = "WHERE text IS NOT NULL AND n_chars >= 100") + """,
        rejected AS (
          SELECT DISTINCT b.doc_id
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 120
          WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIT)) <= 3)
        SELECT t.doc_id,
          CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END AS admitted
        FROM toks t LEFT JOIN rejected r USING (doc_id)
        ORDER BY t.doc_id""")),
    // ------------------------------------------------------------------
    Q(
      "st14_stream_admission_bq",
      (s, dir) => EmbeddingStream.runStreamAdmissionQuantized(s, dir),
      // EMBEDDING-quantized admission (see [[EmbeddingStream]]): the
      // s14 sign-bit codes reach the streaming surface. vec_b is
      // rejected iff an earlier vector within the 120 s event-time
      // horizon (event_ts = epoch + vec_id sec → plain vec_id
      // arithmetic) shares one of the 8 × 8-bit sign bands, agrees on
      // a strict majority of sign bits (Hamming ≤ 31), and verifies
      // at exact cosine > 0.25 (d06's bit-exact arithmetic). The code
      // CTEs are s14's restated; bands are byte-slices of the words.
      Some("""
        WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        codes AS (
          SELECT vec_id,
            CAST(list_sum(list_transform(range(1, 33), i ->
              CASE WHEN v[i] > 0.0 THEN (1::BIGINT << (i - 1))
                   ELSE 0::BIGINT END)) AS BIGINT) AS w0,
            CAST(list_sum(list_transform(range(33, 65), i ->
              CASE WHEN v[i] > 0.0 THEN (1::BIGINT << (i - 33))
                   ELSE 0::BIGINT END)) AS BIGINT) AS w1
          FROM e),
        bands AS (
          SELECT vec_id, w0, w1, CAST(b AS INT) AS band_id,
            CASE WHEN b < 4 THEN (w0 >> (CAST(b AS INT) * 8)) & 255
                 ELSE (w1 >> ((CAST(b AS INT) - 4) * 8)) & 255
            END AS band_key
          FROM codes, unnest(range(0, 8)) AS t(b)),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= 120
          WHERE bit_count(CAST(xor(a.w0, b.w0) AS BIT))
              + bit_count(CAST(xor(a.w1, b.w1) AS BIT)) <= 31),
        rejected AS (
          SELECT DISTINCT c.vec_b AS vec_id
          FROM cand c
          JOIN e x ON x.vec_id = c.vec_a
          JOIN e y ON y.vec_id = c.vec_b
          WHERE list_sum(list_transform(list_zip(x.v, y.v),
                                        p -> p[1] * p[2])) /
                (sqrt(list_sum(list_transform(x.v, q -> q * q))) *
                 sqrt(list_sum(list_transform(y.v, q -> q * q)))) > 0.25)
        SELECT e.vec_id,
          CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS admitted
        FROM e LEFT JOIN rejected r USING (vec_id)
        ORDER BY e.vec_id""")),
    // ------------------------------------------------------------------
    Q(
      "st15_stream_window_topk",
      (s, dir) => EventStream.runWindowTopK(s, dir),
      // Top-3 users per FINALIZED hourly window (see
      // [[EventStream.windowTopK]]): a window emits iff its end is
      // strictly before the final watermark, wm_ms =
      // floor(max µs / 1000) − 1 h (the st02 strict-< timeout rule);
      // within a window users rank by (count desc, user_id).
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        wm AS (SELECT MAX(us) // 1000 - 3600000 AS wms FROM e),
        wc AS (
          SELECT us - us % 3600000000 AS ws, user_id,
            COUNT(*) AS n_events
          FROM e GROUP BY 1, 2),
        fin AS (
          SELECT wc.ws, wc.user_id, wc.n_events FROM wc, wm
          WHERE (wc.ws // 1000) + 3600000 < wm.wms)
        SELECT make_timestamp(ws) AS window_start, user_id, n_events,
          rnk
        FROM (
          SELECT ws, user_id, n_events,
            ROW_NUMBER() OVER (PARTITION BY ws
                               ORDER BY n_events DESC, user_id) AS rnk
          FROM fin)
        WHERE rnk <= 3
        ORDER BY window_start, rnk""")),
    // ------------------------------------------------------------------
    Q(
      "st16_stream_decontaminate",
      (s, dir) => DocumentStream.runStreamDecontaminate(s, dir),
      // Stream-static fuzzy decontamination (see
      // [[DocumentStream.runStreamDecontaminate]]): a corpus doc is
      // rejected iff it shares a SimHash band bucket with a benchmark
      // ('src0') doc at Hamming <= 3. Stateless, so the streaming run
      // equals this batch statement exactly.
      Some(Dedup.sqlSimhashBandsCte("WHERE text IS NOT NULL") + """,
        src AS (
          SELECT doc_id, source FROM documents WHERE text IS NOT NULL),
        bb AS (
          SELECT b.doc_id AS bench_id, b.simhash AS bsim, b.band_id,
            b.band_key
          FROM bands b JOIN src USING (doc_id)
          WHERE src.source = 'src0'),
        cb AS (
          SELECT b.doc_id, b.simhash, b.band_id, b.band_key
          FROM bands b JOIN src USING (doc_id)
          WHERE src.source <> 'src0'),
        rejected AS (
          SELECT DISTINCT cb.doc_id
          FROM cb JOIN bb
            ON cb.band_id = bb.band_id AND cb.band_key = bb.band_key
          WHERE bit_count(CAST(xor(cb.simhash, bb.bsim) AS BIT)) <= 3)
        SELECT s.doc_id,
          CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END AS admitted
        FROM src s LEFT JOIN rejected r USING (doc_id)
        WHERE s.source <> 'src0'
        ORDER BY s.doc_id""")),
    // ------------------------------------------------------------------
    Q(
      "st17_stream_percentiles",
      (s, dir) => EventStream.runPercentiles(s, dir),
      // Streaming GK percentile sketch per event_type (see
      // [[EventStream.runPercentiles]]): sketch values are
      // merge-order-dependent, so the emitted result is the GK rank
      // INVARIANT (q59's convention) — the oracle states the contract
      // as literal TRUE rows, one per (event_type, percentile).
      Some("""
        SELECT event_type, pct, TRUE AS rank_ok
        FROM (SELECT DISTINCT event_type FROM events
              WHERE event_type IS NOT NULL)
        CROSS JOIN (SELECT CAST(0.5 AS DOUBLE) AS pct
                    UNION ALL SELECT CAST(0.95 AS DOUBLE))
        ORDER BY event_type, pct""")),
    // ------------------------------------------------------------------
    Q(
      "st18_stream_heavy_hitters",
      (s, dir) => EventStream.runHeavyHitters(s, dir),
      // Streaming Misra-Gries per-batch merged sketch (see
      // [[EventStream.runHeavyHitters]]): sketch contents are
      // merge-order-dependent, so the emitted result is the MG
      // frequency invariant vs the batch exact counts (q60's
      // convention) — a literal TRUE row per heavy event type.
      Some("""
        WITH c AS (
          SELECT event_type, COUNT(*) AS f FROM events
          WHERE event_type IS NOT NULL GROUP BY event_type),
        t AS (
          SELECT COUNT(*) AS n FROM events WHERE event_type IS NOT NULL)
        SELECT event_type, TRUE AS found, TRUE AS est_ok
        FROM c, t WHERE f * 5 > n
        ORDER BY event_type""")),
    // ------------------------------------------------------------------
    Q(
      "st19_stream_gap_detect",
      (s, dir) => EventStream.runGapDetect(s, dir),
      // Timer-driven silence alerts (see [[EventStream.gapDetect]]):
      // one data batch + the closing no-data batch means an alert
      // fires iff the user's last event predates the final watermark
      // (floor(max µs/1000) ms − 1 h) by more than the 2 h threshold
      // — stated batch-side with identical integer ms arithmetic.
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        la AS (
          SELECT user_id, MAX(us) AS last_us FROM ev GROUP BY user_id),
        wm AS (
          SELECT MAX(us) // 1000 - 3600000 AS w FROM ev)
        SELECT user_id, last_us, w - (last_us // 1000) AS silent_ms
        FROM la, wm
        WHERE (last_us // 1000) + 7200000 < w
        ORDER BY user_id""")),
    // ------------------------------------------------------------------
    Q(
      "st20_stream_moments",
      (s, dir) => EventStream.runMoments(s, dir),
      // Exact integer power sums as state (see
      // [[EventStream.runMoments]]): order-independent, so the oracle
      // states mean/variance as VALUES — both engines compute the
      // integer numerators exactly and divide once (q33's
      // convention, D's rules).
      Some("""
        WITH c AS (
          SELECT event_type,
            CAST(ROUND(value * 100, 0) AS BIGINT) AS c
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        a AS (
          SELECT event_type, COUNT(*) AS n,
            SUM(c) AS s1, SUM(c * c) AS s2
          FROM c GROUP BY event_type)
        SELECT event_type, n,
          CAST(s1 AS DOUBLE) / (100.0 * n) AS mean,
          CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1
               AS DOUBLE) /
          CAST(CAST(n AS HUGEINT) * n * 10000 AS DOUBLE) AS variance
        FROM a
        ORDER BY event_type""")),
    // ------------------------------------------------------------------
    Q(
      "st21_stream_cdc_upsert",
      (s, dir) => EventStream.runCdcUpsert(s, dir),
      // Latest-record-wins CDC materialization (see
      // [[EventStream.runCdcUpsert]]): the batch statement is the
      // argmax-(us, event_id) row per user with 'error' deletes
      // tombstoned out — exactly the compacted table.
      Some("""
        WITH ev AS (
          SELECT event_id, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        last AS (
          SELECT user_id, us AS last_us, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us DESC, event_id DESC) AS rn
            FROM ev)
          WHERE rn = 1)
        SELECT user_id, last_us, value
        FROM last WHERE event_type <> 'error'
        ORDER BY user_id""")),
    // ------------------------------------------------------------------
    Q(
      "st22_stream_index_maintenance",
      (s, dir) => EmbeddingStream.runIndexMaintenance(s, dir),
      // Streaming incremental index maintenance (see
      // [[EmbeddingStream.runIndexMaintenance]]): an upsert/delete
      // vector feed maintains cells + SQ8 codes as O(keys) state
      // under FROZEN artifacts; search runs over the drained state.
      // The oracle states the FIXPOINT with no stream anywhere: the
      // surviving vector set (every 7th negated by its re-upsert,
      // every 9th deleted), frozen-centroid assignment, saturating
      // grid encode (the s20 convention — negated vectors leave the
      // trained box), and the same two-probe integer search.
      Some(sqlIndexFixpoint)),
    // ------------------------------------------------------------------
    Q(
      "st23_stream_windowed_funnel",
      (s, dir) => EventStream.runWindowedFunnel(s, dir),
      // Streaming windowed funnel (see
      // [[EventStream.runWindowedFunnel]]): q66's per-stage
      // conversion windows as per-user mapGroupsWithState, exact
      // under out-of-order arrival with state bounded by the
      // funnel's own conversion horizon. The oracle IS the batch
      // q66 statement — the stream must reach its fixpoint.
      Some("""
        WITH ev AS (
          SELECT user_id, event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type IS NOT NULL),
        v AS (
          SELECT user_id, MIN(us) AS v_us FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN(e.us) AS c_us
          FROM ev e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.us > v.v_us
            AND e.us <= v.v_us + CAST(48 AS BIGINT) * 3600 * 1000000
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(e.us) AS p_us
          FROM ev e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.us > c.c_us
            AND e.us <= c.c_us + CAST(7 AS BIGINT) * 24 * 3600 * 1000000
          GROUP BY e.user_id)
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
          UNION ALL
          SELECT '2_click_within_48h', COUNT(*) FROM c
          UNION ALL
          SELECT '3_purchase_within_7d', COUNT(*) FROM p)
        ORDER BY stage""")),
    // ------------------------------------------------------------------
    Q(
      "st24_stream_hopping",
      (s, dir) => EventStream.runHopping(s, dir),
      // q70's sliding windows LIVE (see [[EventStream.hoppingCounts]]):
      // each event updates its 3 covering 15-minute window states;
      // state is bounded by open windows x fan-out x types, never by
      // the stream. The oracle IS batch q70 — the drained stream must
      // reach the batch fixpoint.
      Some("""
        WITH ev AS (
          SELECT event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
          FROM events WHERE value IS NOT NULL),
        assigned AS (
          SELECT event_type, value,
            us // 300000000 * 300000000 - k.k * 300000000
              AS window_start_us
          FROM ev CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k)
        SELECT window_start_us, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM assigned
        GROUP BY window_start_us, event_type
        ORDER BY window_start_us, event_type""")),
    // ------------------------------------------------------------------
    Q(
      "st25_stream_dsir_admission",
      (s, dir) => DocumentStream.runStreamDsirAdmission(s, dir),
      // Streaming DSIR admission (see
      // [[DocumentStream.runStreamDsirAdmission]]): the offline-
      // trained micro-integer log-ratio model applied statelessly on
      // the ingest stream; admit iff the exact integer score sum
      // >= 0. The oracle restates the score batch-wise from t23's
      // CTE chain — SUM(cnt * r * 1e6) per doc, the same integer.
      Some(s"""
        WITH ${TextAnalysis.sqlDsirChain("src1", 4096)},
        sc AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feats,
            CAST(SUM(CAST(cnt AS DECIMAL(20,0)) * r * 1000000)
                 AS BIGINT) AS score_micros
          FROM docb JOIN ratio USING (b)
          GROUP BY doc_id)
        SELECT doc_id, n_feats, score_micros,
          CAST(score_micros >= 0 AS INT) AS admitted
        FROM sc
        ORDER BY doc_id""")),
    // ------------------------------------------------------------------
    Q(
      "st26_stream_outer_interval_join",
      (s, dir) => EventStream.runIntervalJoinOuter(s, dir),
      // Left-outer stream-stream join: matched pairs emit in their
      // batch (st03's rows, verbatim); a NULL-attributed purchase
      // emits only once the watermark proves no admissible view can
      // still arrive — wm = min of both sides' watermarks (Spark's
      // multi-watermark MIN policy), each max event time floored to
      // ms (st13's pinned rule), and the purchase row is released on
      // strict ts < wm. Purchases at or above the final watermark
      // stay in state and emit nothing — the oracle's gate on the
      // null branch states exactly that.
      Some("""
        WITH p AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase'),
        v AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'view'),
        wm AS (
          SELECT make_timestamp(
            (LEAST((SELECT MAX(epoch_us(ts)) FROM p),
                   (SELECT MAX(epoch_us(ts)) FROM v))
             // 1000 - 3600000) * 1000) AS w),
        m AS (
          SELECT p.event_id AS purchase_id, p.user_id, p.ts,
            v.event_id AS view_event_id, v.ts AS view_ts
          FROM p JOIN v ON p.user_id = v.user_id
           AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR)
        SELECT purchase_id, user_id, ts, view_event_id, view_ts FROM m
        UNION ALL
        SELECT p.event_id, p.user_id, p.ts,
          CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP)
        FROM p, wm
        WHERE p.ts < wm.w
          AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.event_id)
        ORDER BY purchase_id, view_event_id""")),
    // ------------------------------------------------------------------
    Q(
      "st27_stream_index_lifecycle",
      (s, dir) => EmbeddingStream.runIndexLifecycle(s, dir),
      // The maintain -> persist -> serve composition (see
      // [[EmbeddingStream.runIndexLifecycle]]): st22's maintained
      // state written through s26's cell-partitioned layout and
      // served by a DPP-pruned reload -- centroids, grid and codes
      // all read back from disk before a single probe runs. The
      // oracle is st22's fixpoint statement UNCHANGED: same final
      // index, now proven through the storage boundary too.
      Some(sqlIndexFixpoint)),
    // ------------------------------------------------------------------
    Q(
      "st28_stream_cdc_lake_merge",
      (s, dir) => EventStream.runCdcLakeMerge(s, dir),
      // CDC -> partitioned lake MERGE (see
      // [[EventStream.runCdcLakeMerge]]): st21's latest-record-wins
      // compaction executed as per-batch partition-scoped
      // copy-on-write into a key-bucketed parquet lake, read back
      // from the lake files. The oracle is st21's compacted table
      // plus the bucket column -- the lake must converge to it
      // through the storage boundary.
      Some("""
        WITH ev AS (
          SELECT event_id, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        last AS (
          SELECT user_id, us AS last_us, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us DESC, event_id DESC) AS rn
            FROM ev)
          WHERE rn = 1)
        SELECT user_id, CAST(user_id % 8 AS INT) AS bucket,
          last_us, value
        FROM last WHERE event_type <> 'error'
        ORDER BY user_id""")),
    // ------------------------------------------------------------------
    Q(
      "st29_stream_drift_monitor",
      (s, dir) => EmbeddingStream.runDriftMonitor(s, dir),
      // s34's drift accounting run LIVE beside the maintainer (see
      // [[EmbeddingStream.runDriftMonitor]]): every arriving upsert
      // scored statelessly against the frozen artifacts (nearest
      // cell + out-of-box coordinate count), accumulated in an
      // O(|cells|) streaming aggregate. The oracle restates the
      // feed's upsert set (us=1 all, us=2 negated for every 7th;
      // deletes carry no vector) and the same assignment /
      // saturation arithmetic in batch SQL.
      Some("""
        WITH e AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE embedding IS NOT NULL),
        cdims AS (
          SELECT label, CAST(u.i AS INT) AS dim, u.x AS x
          FROM e, unnest(list_transform(range(1, len(v) + 1),
                                        i -> {'i': i, 'x': v[i]})) AS s(u)),
        cent AS (
          SELECT label, list(cx ORDER BY dim) AS cv FROM (
            SELECT label, dim,
              CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cx
            FROM cdims GROUP BY label, dim)
          GROUP BY label),
        gdims AS (
          SELECT CAST(u.i - 1 AS INT) AS dim, u.x AS x
          FROM e, unnest(list_transform(range(1, len(v) + 1),
                         i -> {'i': i, 'x': v[i]})) AS s(u)),
        stats AS (
          SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM gdims GROUP BY dim),
        grid AS (
          SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his
          FROM stats),
        ups AS (
          SELECT vec_id, 1 AS us, v FROM e
          UNION ALL
          SELECT vec_id, 2 AS us, list_transform(v, x -> -x) AS v
          FROM e WHERE vec_id % 7 = 0),
        ac AS (
          SELECT vec_id, us, v, cell FROM (
            SELECT f.vec_id, f.us, f.v, c.label AS cell,
              ROW_NUMBER() OVER (PARTITION BY f.vec_id, f.us ORDER BY
                (list_sum(list_transform(list_zip(f.v, c.cv), p -> p[1]*p[2])) /
                 (sqrt(list_sum(list_transform(f.v, x -> x*x))) *
                  sqrt(list_sum(list_transform(c.cv, x -> x*x))))) DESC,
                c.label) AS rn
            FROM ups f CROSS JOIN cent c) WHERE rn = 1),
        sc AS (
          SELECT ac.cell,
            list_sum(list_transform(range(1, len(v) + 1),
              i -> CASE WHEN v[i] < los[i] OR v[i] > his[i]
                   THEN 1 ELSE 0 END)) AS satc,
            len(v) AS nd
          FROM ac, grid)
        SELECT cell, COUNT(*) AS n_events,
          CAST(SUM(satc) AS BIGINT) AS sat_coords,
          CAST(SUM(nd) AS BIGINT) AS n_coords,
          CAST((1000000 * SUM(satc)) // nullif(SUM(nd), 0) AS BIGINT)
            AS sat_ppm
        FROM sc GROUP BY cell ORDER BY cell""")),
    // ------------------------------------------------------------------
    Q(
      "st30_stream_boilerplate_scrub",
      (s, dir) => DocumentStream.runStreamBoilerplateScrub(s, dir),
      // Streaming boilerplate scrub (see
      // [[DocumentStream.runStreamBoilerplateScrub]]): the
      // offline-trained hot-chunk blocklist (aligned 8-token chunks
      // in >=3 distinct docs, capped at the 4096 hottest by
      // (doc-frequency DESC, chunk)) applied statelessly per row on
      // the ingest stream. The oracle restates discovery AND
      // application batch-wise; docs left with zero kept chunks emit
      // nothing in both engines.
      Some("""
        WITH toks AS (
          SELECT doc_id,
            list_filter(string_split_regex(lower(text), '\s+'),
                        x -> len(x) > 0) AS tl
          FROM documents WHERE text IS NOT NULL),
        ch AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
            array_to_string(list_slice(tl, i*8 + 1, i*8 + 8), ' ')
              AS chunk
          FROM toks, unnest(range(0, len(tl) // 8)) AS t(i)),
        hot AS (
          SELECT chunk FROM (
            SELECT chunk, COUNT(DISTINCT doc_id) AS nd
            FROM ch GROUP BY chunk)
          WHERE nd >= 3
          ORDER BY nd DESC, chunk LIMIT 4096)
        SELECT doc_id, COUNT(*) AS n_kept,
          md5(array_to_string(list(chunk ORDER BY pos), ' '))
            AS clean_digest
        FROM ch
        WHERE chunk NOT IN (SELECT chunk FROM hot)
        GROUP BY doc_id
        ORDER BY doc_id""")),
    // ----------------------------------------------------------------
    Q(
      "st31_stream_classifier_scoring",
      (s, dir) => DocumentStream.runStreamClassifierScoring(s, dir),
      // Streaming classifier scoring (see
      // [[DocumentStream.runStreamClassifierScoring]]): t28's model
      // trained offline, its coefficients applied statelessly on the
      // ingest stream. The oracle re-derives the identical fit (the
      // shared unrolled GD chain) and scores batch-wise.
      Some(s"""
        WITH ${TextAnalysis.sqlClassifierChain("src1", 10, 0.5)}
        SELECT doc_id,
          ROUND(${TextAnalysis.sqlClassifierSigmoid}, 6) AS score,
          CAST(z >= 0 AS INT) AS pred
        FROM (SELECT f.doc_id, ${TextAnalysis.sqlClassifierZ("w")} AS z
              FROM f, w10 w)
        ORDER BY doc_id""")),
    // ------------------------------------------------------------------
    Q(
      "st32_stream_lake_autocompact",
      (s, dir) => EventStream.runCdcLakeAutoCompact(s, dir),
      // CDC append lake with IN-STREAM auto-compaction (see
      // [[EventStream.AutoCompactLake]]): q79's bin-pack OPTIMIZE run
      // from inside foreachBatch every 2nd commit, touched buckets
      // only, manifest swap per commit. The oracle is st28's
      // compacted-table statement UNCHANGED — the hash matches iff
      // the final manifest's resolved state survived 3 mid-stream
      // rewrites byte-identically.
      Some("""
        WITH ev AS (
          SELECT event_id, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        last AS (
          SELECT user_id, us AS last_us, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us DESC, event_id DESC) AS rn
            FROM ev)
          WHERE rn = 1)
        SELECT user_id, CAST(user_id % 8 AS INT) AS bucket,
          last_us, value
        FROM last WHERE event_type <> 'error'
        ORDER BY user_id""")),
    // ------------------------------------------------------------------
    Q(
      "st33_stream_lake_retention",
      (s, dir) => EventStream.runCdcLakeRetention(s, dir),
      // The full in-stream maintenance loop (see
      // [[EventStream.runCdcLakeRetention]]): append -> OPTIMIZE ->
      // retention vacuum of files outside the newest-3 manifests, all
      // from inside foreachBatch. Same oracle as st28/st32 -- the
      // hash matches iff no live or retained file was reclaimed.
      Some("""
        WITH ev AS (
          SELECT event_id, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        last AS (
          SELECT user_id, us AS last_us, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us DESC, event_id DESC) AS rn
            FROM ev)
          WHERE rn = 1)
        SELECT user_id, CAST(user_id % 8 AS INT) AS bucket,
          last_us, value
        FROM last WHERE event_type <> 'error'
        ORDER BY user_id""")),
    // ------------------------------------------------------------------
    Q(
      "st34_stream_wcc_maintenance",
      (s, dir) => EventStream.runStreamWccMaintenance(s, dir),
      // Streaming graph maintenance (see
      // [[EventStream.WccLabelLake]]): q88's seeded WCC converge run
      // from INSIDE foreachBatch every 2nd pair-delta commit, the
      // label store living in the lake. The oracle is q80's batch
      // component histogram UNCHANGED -- min-label relaxation has a
      // start-independent fixpoint and every refresh converges to an
      // observed fixpoint, so the hash match proves the in-stream
      // incremental maintenance ≡ the batch recompute through every
      // storage boundary.
      Some(Graph.sqlConnectedComponents(rounds = 10))),
    // ------------------------------------------------------------------
    Q(
      "st35_stream_sigstore_admission",
      (s, dir) => DocumentStream.runStreamSigstoreAdmission(s, dir),
      // d24's incremental dedup run from inside foreachBatch (see
      // [[DocumentStream.SigStoreLake]]): each micro-batch hashed
      // once, judged against the lake-resident signature store read
      // back from disk, its signatures appended. Batches are
      // id-contiguous slices streamed in order, so the streaming
      // verdicts equal this pure batch statement -- slice arithmetic
      // from the doc_id span plus two per-band MIN aggregations
      // (never in-bucket pair expansion).
      Some(s"""
        ${Dedup.sqlBandsCte},
        mm AS (
          SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx
          FROM documents WHERE text IS NOT NULL),
        sl AS (
          SELECT b.doc_id, b.band_id, b.band_hash,
            CAST(((b.doc_id - mm.mn) * 6) // (mm.mx - mm.mn + 1)
              AS INT) AS slice
          FROM bands b, mm),
        bm AS (
          SELECT band_id, band_hash, MIN(slice) AS ms
          FROM sl GROUP BY band_id, band_hash),
        bsm AS (
          SELECT band_id, band_hash, slice, MIN(doc_id) AS m
          FROM sl GROUP BY band_id, band_hash, slice),
        hitp AS (
          SELECT DISTINCT s.doc_id FROM sl s
          JOIN bm ON s.band_id = bm.band_id
                 AND s.band_hash = bm.band_hash
                 AND bm.ms < s.slice),
        hitb AS (
          SELECT DISTINCT s.doc_id FROM sl s
          JOIN bsm ON s.band_id = bsm.band_id
                  AND s.band_hash = bsm.band_hash
                  AND s.slice = bsm.slice
                  AND bsm.m < s.doc_id),
        dd AS (SELECT DISTINCT doc_id FROM sl)
        SELECT dd.doc_id,
          CAST(hitp.doc_id IS NOT NULL AS INT) AS dup_prior,
          CAST(hitb.doc_id IS NOT NULL AS INT) AS dup_in_batch,
          CAST(hitp.doc_id IS NULL AND hitb.doc_id IS NULL AS INT)
            AS admitted
        FROM dd
        LEFT JOIN hitp ON dd.doc_id = hitp.doc_id
        LEFT JOIN hitb ON dd.doc_id = hitb.doc_id
        ORDER BY dd.doc_id"""))
    ,
    // ------------------------------------------------------------------
    Q(
      "st36_stream_pagerank_maintenance",
      (s, dir) => EventStream.runStreamPagerankMaintenance(s, dir),
      // Streaming rank maintenance (see [[EventStream.RankLake]]):
      // q89's seeded PageRank refresh run from INSIDE foreachBatch
      // every 2nd pair-delta commit, the rank vector living in the
      // lake — cold backfill on the first cadence point, 4-round
      // seeded refreshes after. Integer PageRank is start-dependent
      // (q89's argument), so the oracle restates the ENTIRE streamed
      // recurrence: slice arithmetic, one era per refresh, the exact
      // integer node-count rescale between eras.
      Some(Graph.sqlStreamIncrementalPageRank(slices = 6,
        baseIters = 10, deltaIters = 4, k = 25)))
  )
}
