package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Third tranche of relational operators: time-series densification
  * and other gaps the first two tranches left.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Gap-filled hourly counts (q61) — time-series densification, the
    * resample step every monitoring/feature pipeline needs: hours with
    * no events must appear with n = 0, which no plain groupBy can
    * produce. Shape: the corpus-scale work is ONE map-side-combining
    * groupBy (event_type, hour); the calendar spine is generated from
    * a 1-row min/max aggregate via `sequence` (span-hours × types
    * rows — bounded by wall-clock time and cardinality, NOT corpus
    * size, so it stays tiny at 100 TB) and broadcast; the fill join is
    * spine LEFT JOIN counts on the tiny spine side. Nothing re-reads
    * events twice: the trunc'd projection is computed once and feeds
    * counts, span, and the type dimension.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val ev = events.select(
      date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
    val counts = ev.groupBy("event_type", "hour_ts")
      .agg(count(lit(1)).as("n_obs"))
    val span = ev.agg(min(col("hour_ts")).as("h0"),
      max(col("hour_ts")).as("h1"))
    val hours = span.select(
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour_ts"))
    val types = ev.select("event_type").distinct()
    broadcast(hours).crossJoin(broadcast(types))
      .join(counts, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), col("hour_ts"),
        coalesce(col("n_obs"), lit(0L)).as("n"))
      .orderBy("event_type", "hour_ts")
  }

  /** Referential-integrity audit (q62) — the dangling-reference check
    * a multi-table corpus release runs: documents without an
    * embedding, embeddings without a document, and the intersection,
    * reported as one long-form summary. Shape: two single-column key
    * projections (pruned scans), ONE full-outer equi-join on the key,
    * then a map-side-combining conditional aggregate — no distinct
    * explosion, no second pass. At 100 TB both sides shuffle once on
    * the id; the output is 3 rows.
    */
  def integrityAudit(documents: DataFrame, embeddings: DataFrame)
      : DataFrame = {
    val d = documents.select(col("doc_id")).withColumn("has_d", lit(1))
    val e = embeddings.select(col("vec_id").as("doc_id"))
      .withColumn("has_e", lit(1))
    d.join(e, Seq("doc_id"), "full_outer")
      .agg(
        count(when(col("has_d").isNotNull && col("has_e").isNotNull, 1))
          .as("matched"),
        count(when(col("has_e").isNull, 1)).as("docs_only"),
        count(when(col("has_d").isNull, 1)).as("embeddings_only"))
      .select(expr("stack(3, " +
        "'matched', matched, " +
        "'docs_only', docs_only, " +
        "'embeddings_only', embeddings_only) AS (side, n)"))
      .orderBy("side")
  }

  /** Bits in the q71 Bloom filter — 2^16 bits = 1024 mask words, a
    * filter that broadcasts as a ≤1024-row table NO MATTER how many
    * build keys feed it (dial up for lower false-positive rates; at
    * n keys and 2 hashes the fp rate is (1−e^(−2n/m))²). Declared
    * BEFORE `all`: the oracle strings interpolate it at object init.
    */
  private val bloomBits = 65536

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q61_gap_fill",
      (s, dir) => gapFillHourly(t(s, dir)("events")),
      Some("""
        WITH ev AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
            event_type
          FROM events),
        counts AS (
          SELECT event_type, hour_ts, COUNT(*) AS n_obs
          FROM ev GROUP BY 1, 2),
        span AS (
          SELECT MIN(hour_ts) AS h0, MAX(hour_ts) AS h1 FROM ev),
        hours AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
            AS hour_ts
          FROM span),
        types AS (SELECT DISTINCT event_type FROM ev)
        SELECT t.event_type, h.hour_ts, COALESCE(c.n_obs, 0) AS n
        FROM hours h CROSS JOIN types t
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.hour_ts = h.hour_ts
        ORDER BY t.event_type, h.hour_ts""")),
    // ----------------------------------------------------------------
    Q(
      "q62_integrity_audit",
      (s, dir) => integrityAudit(
        t(s, dir)("documents"), t(s, dir)("embeddings")),
      Some("""
        WITH j AS (
          SELECT d.doc_id AS did, e.vec_id AS eid
          FROM documents d FULL OUTER JOIN embeddings e
            ON d.doc_id = e.vec_id)
        SELECT side, n FROM (
          SELECT 'matched' AS side,
            COUNT(CASE WHEN did IS NOT NULL AND eid IS NOT NULL
                  THEN 1 END) AS n FROM j
          UNION ALL
          SELECT 'docs_only',
            COUNT(CASE WHEN eid IS NULL THEN 1 END) FROM j
          UNION ALL
          SELECT 'embeddings_only',
            COUNT(CASE WHEN did IS NULL THEN 1 END) FROM j)
        ORDER BY side""")),
    // ----------------------------------------------------------------
    Q(
      "q64_funnel_stages",
      (s, dir) => {
        // Ordered-funnel analysis — the event-analytics staple:
        // users who viewed, then CLICKED AFTER their first view, then
        // PURCHASED AFTER that click (strict event-time ordering, not
        // mere co-occurrence). Shape: three per-user conditional-min
        // aggregates chained by user_id equi-joins — each stage's
        // frame only shrinks, every aggregate map-side-combines, and
        // nothing is ever windowed or sorted globally. Determinism:
        // pure µs MIN arithmetic.
        val ev = t(s, dir)("events")
          .filter(col("event_type").isNotNull)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("v_us"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("us") > col("v_us"))
          .groupBy("user_id").agg(min(col("us")).as("c_us"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("us") > col("c_us"))
          .groupBy("user_id").agg(min(col("us")).as("p_us"))
        v.agg(count(lit(1)).as("n_users"))
          .select(lit("1_view").as("stage"), col("n_users"))
          .unionByName(p.agg(count(lit(1)).as("n_users"))
            .select(lit("3_purchase_after_click").as("stage"),
              col("n_users")))
          .unionByName(c.agg(count(lit(1)).as("n_users"))
            .select(lit("2_click_after_view").as("stage"),
              col("n_users")))
          .orderBy("stage")
      },
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
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(e.us) AS p_us
          FROM ev e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.us > c.c_us
          GROUP BY e.user_id)
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
          UNION ALL
          SELECT '2_click_after_view', COUNT(*) FROM c
          UNION ALL
          SELECT '3_purchase_after_click', COUNT(*) FROM p)
        ORDER BY stage""")),
    // ----------------------------------------------------------------
    Q(
      "q66_windowed_funnel",
      (s, dir) => {
        // WINDOWED funnel — q64 with per-stage CONVERSION WINDOWS,
        // which is what funnel products actually compute: a click
        // only converts within 48 h of the first view, a purchase
        // only within 7 d of that qualifying click (a purchase months
        // later is a separate journey, not funnel conversion). Same
        // chained conditional-min shape as q64 — each stage is a
        // per-user MIN over events inside (prev_us, prev_us + window]
        // — so each stage's frame only shrinks, every aggregate
        // map-side-combines, and nothing is windowed or sorted
        // globally. Windows are exact integer µs bounds; at the
        // testdata's 30-day span the 48 h gate drops ~40% of
        // clickers, so the bound is exercised, not decorative.
        val ev = t(s, dir)("events")
          .filter(col("event_type").isNotNull)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val clickW = 48L * 3600L * 1000000L
        val purchW = 7L * 24L * 3600L * 1000000L
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("v_us"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("us") > col("v_us") &&
            col("us") <= col("v_us") + lit(clickW))
          .groupBy("user_id").agg(min(col("us")).as("c_us"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("us") > col("c_us") &&
            col("us") <= col("c_us") + lit(purchW))
          .groupBy("user_id").agg(min(col("us")).as("p_us"))
        v.agg(count(lit(1)).as("n_users"))
          .select(lit("1_view").as("stage"), col("n_users"))
          .unionByName(c.agg(count(lit(1)).as("n_users"))
            .select(lit("2_click_within_48h").as("stage"),
              col("n_users")))
          .unionByName(p.agg(count(lit(1)).as("n_users"))
            .select(lit("3_purchase_within_7d").as("stage"),
              col("n_users")))
          .orderBy("stage")
      },
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
    // ----------------------------------------------------------------
    Q(
      "q65_retention_cohorts",
      (s, dir) => {
        // Retention-cohort matrix — the other event-analytics staple:
        // users cohorted by FIRST-seen day, counted as retained on
        // each later day they were active (offsets 0–7). Shape: one
        // distinct over (user, day) — map-side combined — a per-user
        // min-day aggregate, one equi-join back, and a tiny final
        // groupBy; the matrix is |cohorts|×8, calendar-bounded like
        // q61's spine. Day boundaries are UTC (the session TZ) in
        // both engines; offsets are exact integer day differences.
        val act = t(s, dir)("events")
          .select(col("user_id"),
            date_trunc("day", col("ts")).as("day"))
          .distinct()
        val cohort = act.groupBy("user_id")
          .agg(min(col("day")).as("cohort_day"))
        act.join(cohort, "user_id")
          .select(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_offset"))
          .filter(col("day_offset") <= 7)
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id,
            date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
          FROM events),
        cohort AS (
          SELECT user_id, MIN(day) AS cohort_day
          FROM act GROUP BY user_id)
        SELECT c.cohort_day,
          CAST(date_diff('day', c.cohort_day, a.day) AS INT)
            AS day_offset,
          COUNT(*) AS n_users
        FROM act a JOIN cohort c USING (user_id)
        WHERE date_diff('day', c.cohort_day, a.day) <= 7
        GROUP BY c.cohort_day, day_offset
        ORDER BY c.cohort_day, day_offset""")),
    // ----------------------------------------------------------------
    Q(
      "q67_scd2_history",
      (s, dir) => {
        // Type-2 slowly-changing-dimension HISTORY — the warehouse
        // versioning staple q47's MERGE and st21's CDC compaction
        // both stop short of: instead of keeping only the LATEST row
        // per key, every upsert becomes a VERSIONED row with a
        // validity interval [valid_from, valid_to), closed by the
        // key's next event of any type. 'error' events are deletes:
        // they close the open interval without opening one (the st21
        // tombstone rule), so a deleted key has no current row.
        // Shape: ONE window per user over its own events (partitions
        // bounded by per-key activity, never corpus-wide — the q09
        // discipline); lead() closes intervals, a projection flags
        // is_current; nothing shuffles twice. At 100 TB this is a
        // single keyed shuffle + per-key sort — the same cost as the
        // CDC compaction it extends.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        t(s, dir)("events")
          .filter(col("event_type").isNotNull && col("value").isNotNull)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), unix_micros(col("ts")).as("us"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .filter(col("event_type") =!= "error")
          .select(col("user_id"), col("event_id"), col("value"),
            col("us").as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.cast("int").as("is_current"))
          .orderBy("user_id", "valid_from_us", "event_id")
      },
      Some("""
        WITH ev AS (
          SELECT event_id, user_id, event_type, value,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        led AS (
          SELECT *, LEAD(us) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS valid_to_us
          FROM ev)
        SELECT user_id, event_id, value,
          us AS valid_from_us, valid_to_us,
          CAST(valid_to_us IS NULL AS INT) AS is_current
        FROM led
        WHERE event_type <> 'error'
        ORDER BY user_id, valid_from_us, event_id""")),
    // ----------------------------------------------------------------
    Q(
      "q69_interpolate_series",
      (s, dir) => {
        // Linear INTERPOLATION resample — the feature-store step
        // q61's zero-fill can't express: a metric (mean event value)
        // on a fixed 5-minute grid where empty buckets take the
        // LINEAR blend of the nearest observed neighbors and edge
        // gaps carry the nearest observation. Buckets are integer
        // MICROSECONDS (epoch-floored) so the grid, the join keys
        // and the interpolation weights are engine-exact integers;
        // the only doubles are the per-bucket means (decimal-exact
        // sums, the D discipline) and the final blend — pure IEEE
        // + - * / with identical parenthesization in the oracle, so
        // the engines agree bit-for-bit UNROUNDED (see the no-round
        // note below: a 6-dp round would add .5-tie divergence).
        // Shape: corpus-scale work is ONE map-side-combining groupBy
        // (type, bucket); the spine is a 1-row min/max aggregate
        // exploded to span-buckets x types (calendar-bounded, NOT
        // corpus-bounded) and broadcast; the ffill/bfill windows run
        // per type over the tiny spine, never over events.
        interpolateSeries(t(s, dir)("events"), 300000000L)
      },
      /* body moved to interpolateSeries */
      sqlQ69),
    // ----------------------------------------------------------------
    Q(
      "q70_hopping_window",
      (s, dir) => {
        // HOPPING (sliding) window aggregation via Spark's native
        // `window()` TVF — 15-minute windows every 5 minutes, the
        // overlapping-window staple (rolling rates, SLO windows)
        // that q22's tumbling hours can't express. Spark assigns
        // each event to its wd/sd = 3 covering windows MAP-SIDE (an
        // Expand of fixed fan-out, no self-join, no spine join), and
        // the aggregate map-side-combines on (window, type) —
        // corpus-scale cost is 3x the tumbling groupBy, not a range
        // join. The oracle restates the assignment arithmetically:
        // the covering window starts are bucket5(ts) - k*5min for
        // k in 0..2 (epoch-aligned, the TVF's own alignment).
        // Output keys are integer MICROSECONDS (the q69 discipline).
        val ev = t(s, dir)("events")
          .filter(col("value").isNotNull)
        ev.groupBy(
            window(col("ts"), "15 minutes", "5 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            D.dbl(sum(D.m(col("value")))).as("total"))
          .select(unix_micros(col("w.start")).as("window_start_us"),
            col("event_type"), col("n"), col("total"))
          .orderBy("window_start_us", "event_type")
      },
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
    // ----------------------------------------------------------------
    Q(
      "q71_bloom_prefilter_join",
      (s, dir) =>
        // Bloom-prefiltered join (see [[bloomPrefilterJoin]]): the
        // explicit runtime-filter pattern — a fixed-size Bloom filter
        // over the qualifying customer keys broadcasts and map-side
        // prunes orders BEFORE the real join, with the false-positive
        // audit the exact join makes free.
        bloomPrefilterJoin(
          t(s, dir)("customer"), t(s, dir)("orders")),
      Some(s"""
        WITH keys AS (
          SELECT DISTINCT c_custkey AS k FROM customer
          WHERE c_acctbal > 9000),
        hk AS (
          SELECT k,
            CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)
                 AS BIGINT) AS x
          FROM keys),
        bits AS (
          SELECT DISTINCT p FROM (
            SELECT x % $bloomBits AS p FROM hk
            UNION ALL
            SELECT (x // $bloomBits) % $bloomBits AS p FROM hk)),
        op AS (
          SELECT o_custkey, o_totalprice, o_orderpriority,
            CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                 AS BIGINT) AS x
          FROM orders WHERE o_custkey IS NOT NULL),
        pass AS (
          SELECT o.* FROM op o
          WHERE EXISTS (SELECT 1 FROM bits b
                        WHERE b.p = o.x % $bloomBits)
            AND EXISTS (SELECT 1 FROM bits b
                        WHERE b.p = (o.x // $bloomBits) % $bloomBits)),
        audit AS (
          SELECT COUNT(*) AS n_bloom_pass,
            SUM(CASE WHEN k.k IS NULL THEN 1 ELSE 0 END)
              AS n_false_pos
          FROM pass LEFT JOIN keys k ON pass.o_custkey = k.k),
        res AS (
          SELECT o_orderpriority, COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
              AS revenue
          FROM pass JOIN keys k ON pass.o_custkey = k.k
          GROUP BY o_orderpriority)
        SELECT o_orderpriority, n_orders, revenue,
          CAST(n_bloom_pass AS BIGINT) AS n_bloom_pass,
          CAST(n_false_pos AS BIGINT) AS n_false_pos
        FROM res CROSS JOIN audit
        ORDER BY o_orderpriority""")),
    // ----------------------------------------------------------------
    Q(
      "q87_seasonal_anomaly",
      (s, dir) => {
        // SEASONAL-BASELINE ANOMALY DETECTION — the ingest-monitoring
        // staple a pipeline runs over its own event stream: hourly
        // per-type counts on a ZERO-FILLED hour grid (a missing hour
        // is itself a signal, so the spine is not optional), a
        // seasonal baseline per (type, hour-of-day), and the top-20
        // hours by |z|. Determinism without FP caveats: hours are
        // integer epoch-hour indices (hod = idx % 24 — UTC-aligned,
        // no calendar functions), the baseline is carried as INTEGER
        // sums (cnt, Σn, Σn²; the variance numerator Σn²·cnt − (Σn)²
        // computed in DECIMAL(38,0)/HUGEINT exact integer space), and
        // the doubles appear only in the FINAL identical-expression
        // division/sqrt — both engines divide the same integers, so
        // z is bit-identical. Ranking uses the RAW z (the s33 rule);
        // round(·, 6) only on emit. Constant series (zero variance)
        // are excluded by the integer num > 0 gate, never by a
        // float epsilon.
        //
        // Scale shape: ONE map-side-combining (type, hour) count over
        // the corpus; the spine is calendar×types-bounded (explode of
        // a broadcast 1-row min/max, the q69 discipline); the
        // baseline is ≤ types·24 rows broadcast back; top-20 via
        // orderBy+limit (TakeOrderedAndProject).
        seasonalAnomaly(t(s, dir)("events"))
      },
      Some("""
        WITH e AS (
          -- FLOOR division, stated explicitly: DuckDB's // TRUNCATES
          -- toward zero (-7 // 2 = -3, verified on 1.0.0), so the
          -- Spark side's floor correction needs the same here. The
          -- numerator is made exactly divisible by subtracting the
          -- positive remainder, so // on it is floor = truncate.
          SELECT event_type,
            (epoch_us(CAST(ts AS TIMESTAMP))
             - ((epoch_us(CAST(ts AS TIMESTAMP)) % 3600000000)
                + 3600000000) % 3600000000) // 3600000000 AS idx
          FROM events WHERE ts IS NOT NULL),
        bounds AS (SELECT MIN(idx) AS i0, MAX(idx) AS i1 FROM e),
        spine AS (
          SELECT t.event_type, g.idx
          FROM (SELECT DISTINCT event_type FROM e) t
          CROSS JOIN (SELECT unnest(range((SELECT i0 FROM bounds),
                                          (SELECT i1 FROM bounds) + 1))
                        AS idx) g),
        hourly AS (
          SELECT s.event_type, s.idx, ((s.idx % 24) + 24) % 24 AS hod,
            COALESCE(c.n, 0) AS n
          FROM spine s LEFT JOIN (
            SELECT event_type, idx, COUNT(*) AS n FROM e GROUP BY 1, 2) c
          ON c.event_type = s.event_type AND c.idx = s.idx),
        base AS (
          SELECT event_type, hod, COUNT(*) AS cnt,
            CAST(SUM(n) AS HUGEINT) AS s1,
            CAST(SUM(n * n) AS HUGEINT) AS s2
          FROM hourly GROUP BY 1, 2),
        z AS (
          SELECT hr.event_type, hr.idx, hr.n, b.cnt, b.s1,
            b.s2 * b.cnt - b.s1 * b.s1 AS num
          FROM hourly hr JOIN base b
            ON b.event_type = hr.event_type AND b.hod = hr.hod
          WHERE b.s2 * b.cnt - b.s1 * b.s1 > 0),
        sc AS (
          SELECT event_type, idx, n,
            CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean_n,
            (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
              / sqrt(CAST(num AS DOUBLE) / CAST(cnt * cnt AS DOUBLE))
              AS zscore
          FROM z)
        SELECT CAST(rnk AS INT) AS rnk, event_type,
          idx * 3600000000 AS hour_us, n,
          ROUND(mean_n, 6) AS mean_n, ROUND(zscore, 6) AS zscore
        FROM (SELECT *, ROW_NUMBER() OVER (
                ORDER BY abs(zscore) DESC, event_type, idx) AS rnk
              FROM sc)
        WHERE rnk <= 20
        ORDER BY rnk"""))
  )

  /** The q87 body, factored for the engineered-spike spec: takes any
    * frame with (event_type, ts) and returns the top-k anomalous
    * hours. See the q87 entry for the determinism and scale notes.
    */
  def seasonalAnomaly(events: DataFrame, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(abs(col("zscore")).desc, col("event_type"), col("idx"))
    // FLOOR division on BOTH sides, stated explicitly: Spark `div`
    // and DuckDB `//` BOTH truncate toward zero (the latter verified
    // empirically on 1.0.0 — an earlier advisory claimed it floors),
    // so each engine gets an explicit floor form and a pre-1970
    // timestamp (negative epoch micros) lands in the same hour in
    // both. Integer corrections only — no lossy double round-trip.
    val ev = events.filter(col("ts").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000 + " +
          "(case when unix_micros(ts) % 3600000000 < 0 " +
          "then -1 else 0 end)").as("idx"))
    val bounds = ev.agg(min("idx").as("i0"), max("idx").as("i1"))
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("i0"), col("i1"))).as("idx"))
    val hourly = spine
      .join(ev.groupBy("event_type", "idx")
        .agg(count(lit(1)).as("n")),
        Seq("event_type", "idx"), "left")
      .select(col("event_type"), col("idx"),
        // pmod, not %: hour-of-day must stay in [0, 24) even for
        // negative hour indices (pre-1970 data).
        expr("pmod(idx, 24)").as("hod"),
        coalesce(col("n"), lit(0L)).as("n"))
    // Moment sums in DECIMAL(38,0) — cast BEFORE the fold, so the
    // sums stay exact to 10³⁸ (the oracle's HUGEINT class); a plain
    // LONG sum of n² would wrap silently near 10¹⁹.
    val base = hourly.groupBy("event_type", "hod")
      .agg(count(lit(1)).as("cnt"),
        sum(col("n").cast("decimal(38,0)")).as("s1"),
        sum(expr("cast(n as decimal(38,0)) * n")).as("s2"))
    hourly.join(broadcast(base), Seq("event_type", "hod"))
      .withColumn("num", expr(
        "cast(s2 as decimal(38,0)) * cnt - cast(s1 as decimal(38,0)) * s1"))
      .filter(col("num") > 0)
      .withColumn("zscore", expr(
        "(cast(n as double) - cast(s1 as double) / cast(cnt as double))" +
          " / sqrt(cast(num as double) / cast(cnt * cnt as double))"))
      .orderBy(abs(col("zscore")).desc, col("event_type"), col("idx"))
      .limit(k)
      .withColumn("rnk", row_number().over(w))
      .select(col("rnk"), col("event_type"),
        (col("idx") * 3600000000L).as("hour_us"), col("n"),
        round(expr("cast(s1 as double) / cast(cnt as double)"), 6)
          .as("mean_n"),
        round(col("zscore"), 6).as("zscore"))
      .orderBy("rnk")
  }

  /** Bloom-prefiltered join (q71) — the runtime-filter pattern made
    * explicit: hash the qualifying build-side keys (customers with
    * c_acctbal > 9000) twice into a `bloomBits`-bit Bloom filter,
    * broadcast the filter, and map-side drop probe rows (orders)
    * whose key cannot possibly match BEFORE the real join runs.
    * This is what saves the shuffle at 100 TB: a raw broadcast of
    * the key set grows with the build side, but the filter is FIXED
    * SIZE — represented here as a (word, mask) table of ≤ m/64 rows
    * aggregated with bit_or, so "might contain" is two broadcast
    * lookups and two bit tests, all codegen. No false negatives by
    * construction (the exact-equality spec); false positives only
    * cost wasted probe rows, and the exact join behind the filter
    * removes them — the output manifests the per-priority totals
    * plus the (n_bloom_pass, n_false_pos) audit, so the oracle row
    * proves BOTH the join result and the filter's exact selectivity.
    *
    * Determinism: positions come from the 60-bit md5 prefix of the
    * key's decimal string split into two 16-bit hashes — integer
    * arithmetic end to end, so DuckDB rebuilds the identical filter
    * and the false-positive COUNT hash-matches exactly.
    */
  def bloomPrefilterJoin(customer: DataFrame,
      orders: DataFrame): DataFrame = {
    val m = bloomBits
    def hx(k: Column): Column =
      conv(substring(md5(k.cast("string")), 1, 15), 16, 10).cast("long")
    val keys = customer.filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("k")).distinct()
    // The filter as a (word, mask) table: ≤ m/64 rows, one bit_or
    // aggregate over both hash positions of every key.
    val words = keys.select(hx(col("k")).as("x"))
      .select(explode(array(
        expr(s"x % $m"), expr(s"(x div $m) % $m"))).as("p"))
      .select(expr("p div 64").as("w"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("mask"))
    val probe = orders.filter(col("o_custkey").isNotNull)
      .select(col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"), hx(col("o_custkey")).as("x"))
      .select(col("*"),
        expr(s"x % $m").as("p1"), expr(s"(x div $m) % $m").as("p2"))
    // Two broadcast lookups + bit tests; a missing word row is a
    // null mask and the bit test fails — might-contain = false.
    def hit(p: String, alias: String) = {
      val wd = words.select(col("w").as(s"w_$alias"),
        col("mask").as(s"mask_$alias"))
      (df: DataFrame) => df
        .join(broadcast(wd),
          expr(s"$p div 64") === col(s"w_$alias"), "left")
        .filter(
          expr(s"mask_$alias & shiftleft(1L, cast($p % 64 as int))")
            =!= 0L)
    }
    // `passed` feeds both the audit and the result — two pruned
    // passes over the pre-filtered probe (cheaper than pinning it:
    // the filter already did the heavy pruning map-side).
    val passed = hit("p2", "b")(hit("p1", "a")(probe))
      .select("o_custkey", "o_totalprice", "o_orderpriority")
    val audit = passed
      .join(broadcast(keys), col("o_custkey") === col("k"), "left")
      .agg(count(lit(1)).as("n_bloom_pass"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_false_pos"))
    val res = passed
      .join(broadcast(keys), col("o_custkey") === col("k"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        D.dbl(sum(D.m(col("o_totalprice")))).as("revenue"))
    res.crossJoin(broadcast(audit))
      .orderBy("o_orderpriority")
  }

  /** The q69 body, factored so the spec can drive engineered series
    * (exact blend values, edge carry, obs passthrough) directly.
    * Input: an events frame with (ts, event_type, value).
    */
  private[graft] def interpolateSeries(
      events: DataFrame, step: Long): DataFrame = {
    val ev = events
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        // integral floor-to-bucket: Column./ is double division,
        // so the epoch floor must go through SQL `div`
        expr(s"unix_micros(ts) div ${step}L * ${step}L")
          .as("bucket_us"),
        col("value"))
    val obs = ev.groupBy("event_type", "bucket_us")
          .agg((sum(D.m(col("value"))).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        val span = ev.agg(min(col("bucket_us")).as("b0"),
          max(col("bucket_us")).as("b1"))
        val spine = span.select(
          explode(expr(s"sequence(b0, b1, ${step}L)")).as("bucket_us"))
        val types = ev.select("event_type").distinct()
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("bucket_us")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        // bfill as a RUNNING frame over DESCENDING order, NOT a
        // currentRow->unboundedFollowing frame: Spark evaluates
        // running (unboundedPreceding->currentRow) frames
        // incrementally in O(n) per partition but recomputes
        // unbounded-FOLLOWING frames from scratch at every row —
        // O(n^2), measured 28 s on the sf0.1 spine vs ~1 s reversed.
        val wF = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("bucket_us").desc)
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val obsB = when(col("v").isNotNull, col("bucket_us"))
        broadcast(spine).crossJoin(broadcast(types))
          .join(obs, Seq("event_type", "bucket_us"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
          .withColumn("pb", last(obsB, ignoreNulls = true).over(wB))
          .withColumn("nv", last(col("v"), ignoreNulls = true).over(wF))
          .withColumn("nb", last(obsB, ignoreNulls = true).over(wF))
          .select(col("event_type"), col("bucket_us"),
            // NO rounding: the blend is pure IEEE + - * / over
            // engine-identical inputs (decimal-exact means, integer
            // weights), so both engines agree bit-for-bit — and a
            // 6-dp round would ADD divergence (interpolating
            // 2-decimal means can land exactly on a .5 tie, where
            // Spark rounds half-up and DuckDB half-even)
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("bucket_us") - col("pb")).cast("double") /
                  (col("nb") - col("pb")).cast("double")))
              .as("v"),
            when(col("v").isNotNull, "obs")
              .when(col("pv").isNull || col("nv").isNull, "edge")
              .otherwise("interp").as("src"))
          .orderBy("event_type", "bucket_us")
  }

  private def sqlQ69: Option[String] = Some("""
        WITH ev AS (
          SELECT event_type,
            epoch_us(CAST(ts AS TIMESTAMP)) // 300000000 * 300000000
              AS bucket_us,
            value
          FROM events WHERE value IS NOT NULL),
        obs AS (
          SELECT event_type, bucket_us,
            CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS v
          FROM ev GROUP BY 1, 2),
        span AS (
          SELECT MIN(bucket_us) AS b0, MAX(bucket_us) AS b1 FROM ev),
        spine AS (
          SELECT unnest(generate_series(b0, b1, 300000000))
            AS bucket_us
          FROM span),
        types AS (SELECT DISTINCT event_type FROM ev),
        grid AS (
          SELECT t.event_type, s.bucket_us, o.v
          FROM spine s CROSS JOIN types t
          LEFT JOIN obs o
            ON o.event_type = t.event_type
            AND o.bucket_us = s.bucket_us),
        filled AS (
          SELECT event_type, bucket_us, v,
            LAST_VALUE(v IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY bucket_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket_us END
                       IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY bucket_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
            FIRST_VALUE(v IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY bucket_us
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket_us END
                        IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY bucket_us
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
          FROM grid)
        SELECT event_type, bucket_us,
          CASE
            WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv) *
              (CAST(bucket_us - pb AS DOUBLE)
                / CAST(nb - pb AS DOUBLE))
          END AS v,
          CASE WHEN v IS NOT NULL THEN 'obs'
               WHEN pv IS NULL OR nv IS NULL THEN 'edge'
               ELSE 'interp' END AS src
        FROM filled
        ORDER BY event_type, bucket_us""")
}
