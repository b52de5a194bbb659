package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // size(null) = null (not -1), matching the DuckDB oracle's NULL
      // semantics should null text ever reach a size().
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same warn-and-continue data-contract preflight as Verify: a
    // testdata drift should be named here, not inferred from a wall of
    // BENCH FAIL lines.
    Canary.check(spark, sfDir) match {
      case Seq() => System.err.println(s"[canary] data contract OK for $sfDir")
      case ps => ps.foreach(p => System.err.println(s"[canary] CONTRACT DRIFT: $p"))
    }
    // TWO timed passes, report the per-query MINIMUM. Pass 1 doubles
    // as the warm pass (codegen compilation + JIT of the hash/digest
    // hot paths land somewhere in it); min-of-2 makes each query's
    // number robust to one-off warmup/GC landing on EITHER pass — a
    // single warm pass demonstrably wasn't (r6: 8x swing on the head
    // queries of a byte-identical engine). A failing query is
    // recorded as -1 (a sentinel the sum skips) and listed in
    // "failed" — never as a silent ~0s success that would inflate
    // the bench.
    def timed(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          // noop sink forces full materialization of every output column
          // (count() lets Catalyst prune the projections being measured).
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case t: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Dev-only: restrict to queries whose name contains any of the
    // comma-separated filter terms — for re-measuring a handful of
    // queries on a quiet machine without paying the full
    // 2×-the-surface bench. The driver never sets it.
    val nameFilter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", "")
    val filterTerms = nameFilter.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    // NAME ORDER, deterministically — `queries` is a HashMap, so its
    // iteration order reshuffles whenever the key set grows, and any
    // query that reuses a per-(session, dir) memoized artifact
    // (p08/p09's admission gate, the graph tier's pair scan, the PQ
    // codebooks) silently flips between warm and cold across rounds:
    // r19's map order put p09 before its memo provider and it
    // measured 16 s where r18's order measured 3 s, on identical
    // code. Sorted order keeps warm/cold assignment identical from
    // round to round, so bench deltas mean code, not hashing.
    def pass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) =>
          filterTerms.isEmpty || filterTerms.exists(name.contains) }
        .map { case (name, fn) =>
          val (t, ok) = timed(name, fn)
          (name, t, ok)
        }
    val twoPass = pass().zip(pass()).map { case ((n, t1, ok1), (_, t2, ok2)) =>
      (n, if (ok1) t1 else -1.0, if (ok2) t2 else -1.0)
    }
    // Bounded third pass: a query whose two timings disagree by > 2×
    // was measured under a noisy neighbor on at least one of them
    // (r9's q15 measured 39.1 s vs 3.3 s on identical plans). One
    // retry for the ≤ 5 worst-spread queries keeps the reported min
    // honest without re-paying the whole bench. The index-build
    // queries are EXCLUDED: their p1 pays training and p2 reuses the
    // per-session memo (pqTrainShared/ivfPqTrainShared), so their
    // inter-pass spread is structural information, not noise — a
    // retry would only reproduce p2 and waste a slot a genuinely
    // contended query needs.
    val memoizedBuilds = Set(
      "s07_pq_train", "s08_pq_adc_topk", "s11_ivfpq", "s12_ivfpq_refined")
    val retrySet = twoPass
      .collect { case (n, t1, t2) if !memoizedBuilds(n) && t1 > 0 && t2 > 0 &&
        math.max(t1, t2) / math.min(t1, t2) > 2.0 =>
        (n, math.max(t1, t2) / math.min(t1, t2)) }
      .sortBy(-_._2).take(5).map(_._1).toSet
    val fns = SparkEntry.queries
    val results = twoPass.map { case (n, t1, t2) =>
      val t3 =
        if (retrySet(n)) { val (t, ok) = timed(n, fns(n)); if (ok) t else -1.0 }
        else -1.0
      val ts = Seq(t1, t2, t3).filter(_ >= 0)
      (n, if (ts.nonEmpty) ts.min else -1.0, ts.nonEmpty, t1, t2, t3)
    }
    val qs = results.map { case (k, v, ok, _, _, _) =>
      s"\"" + k + "\":" + (if (ok) v else -1.0)
    }.mkString("{", ",", "}")
    // ALL raw passes, per query (-1 = failed or, for p3, not retried):
    // a contended machine inflates p1 AND p2 together (BENCH_r08's
    // head queries measured 6× their clean times), and with only the
    // min in the artifact nothing lets a reader tell contention from
    // regression. "queries" stays the min the driver compares;
    // "passes" is the self-diagnosis. Locale-pinned %.3f: a
    // comma-decimal locale would corrupt the JSON.
    def d3(t: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))
    val passes = results.map { case (k, _, _, t1, t2, t3) =>
      val p3 = if (t3 >= 0) s""","p3":${d3(t3)}""" else ""
      s""""$k":{"p1":${d3(t1)},"p2":${d3(t2)}$p3}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _, _, _) => v }.sum
    // A filtered run must be self-describing: without the marker a
    // stray SPARK_GRAFT_BENCH_FILTER in the environment would emit a
    // dramatically smaller "total" indistinguishable from a full run.
    val filterField =
      if (nameFilter.isEmpty) "" else s""","filter":"$nameFilter""""
    // Echo the core-count contract back in the artifact (r19 verdict
    // item 2): the driver's scaling check compares 8- vs 32-core runs
    // and, with nothing in the JSON proving which count a run used,
    // flagged `suspect_cpus_ignored` even though SPARK_GRAFT_CPUS is
    // honored above. "cpus" is the env contract as parsed;
    // "parallelism" is what the scheduler actually resolved it to.
    val cpusField =
      s""","cpus":$cpus,"parallelism":${spark.sparkContext.defaultParallelism}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"failed":$failed$filterField$cpusField,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full line — console tails have truncated the
    // head of long JSON lines in past rounds.
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_last.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // The harness that records this run keeps only the last ~2000 chars
    // of console output; the full line above is ~9 kB at 175 queries, so
    // its head is always cut off and the run's summary is lost to any
    // tail-based reader (observed three rounds running). Print a compact
    // trailer LAST — small enough to survive the tail window intact —
    // carrying the totals plus the 10 slowest queries; the complete
    // per-query/per-pass payload stays in the file written above.
    val slow = results.filter(_._3).sortBy(-_._2).take(10)
      .map { case (k, v, _, _, _, _) => s""""$k":${d3(v)}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","nqueries":${results.size},"failed":$failed,"slowest":$slow$filterField$cpusField,"sf":"$sfDir","full":"bench_last.json"}""")
    spark.stop()
  }
}
