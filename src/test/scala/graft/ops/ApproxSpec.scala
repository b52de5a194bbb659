package graft.ops

import graft.SparkSpec

/** Pins the error bounds of the sketch queries (q27/q49). Their
  * driver-oracle rows state the same envelopes as TRUE/FALSE
  * invariants; these tests assert the booleans directly so a sketch
  * regression fails HERE with the offending group named, not as an
  * opaque hash mismatch.
  */
class ApproxSpec extends SparkSpec {

  test("q27 approx_count_distinct within 6% of exact for every group (sf0.01)") {
    val q = graft.SparkEntry.queries("q27_approx_distinct")
    val rows = q(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Boolean]("approx_within_err"),
        s"group $flag: estimate outside 6% of exact " +
          s"(${r.getAs[Long]("exact_parts")} exact; rsd=0.02 requested)")
    }
  }

  test("HLL: union of per-source sketches ≈ one-pass global sketch ≈ exact (sf0.01)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    // Per-source sketches merged via hll_union_agg — the rollup path
    // a 100 TB job takes (shuffle carries sketches, not doc_ids).
    val merged = docs.groupBy("source")
      .agg(hll_sketch_agg(col("doc_id"), 14).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("m"))
      .head().getLong(0)
    val row = docs.agg(
      hll_sketch_estimate(hll_sketch_agg(col("doc_id"), 14)).as("g"),
      countDistinct(col("doc_id")).as("e")).head()
    val (global, exact) = (row.getLong(0), row.getLong(1))
    val relExact = math.abs(merged - exact).toDouble / exact
    assert(relExact <= 0.03,
      s"merged $merged vs exact $exact: rel_err $relExact > 0.03 (lgK=14, rsd 0.8%)")
    val relGlobal = math.abs(merged - global).toDouble / global
    assert(relGlobal <= 0.01,
      s"merged $merged vs one-pass global $global: rel_err $relGlobal > 0.01")
  }

  test("percentile sketch: GK rank contract survives the 32-way distributed merge (sf0.01)") {
    import org.apache.spark.sql.functions._
    val eps = 0.01
    val pcts = Seq(0.25, 0.5, 0.75, 0.95)
    val sketch = udaf(
      new graft.functions.PercentileSketchAgg(pcts, eps),
      org.apache.spark.sql.Encoders.scalaDouble)
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_extendedprice").cast("double").as("v"))
    val n = li.count()
    // Force a wide merge: 32 partitions → 32 partial sketches, every
    // final value is the product of Aggregator.merge.
    val vals = li.repartition(32).agg(sketch(col("v"))).head()
      .getSeq[Double](0)
    val sorted = li.orderBy("v").collect().map(_.getDouble(0))
    pcts.zip(vals).foreach { case (p, x) =>
      // Tie-aware rank interval of x must intersect [⌊(p-ε)n⌋,⌈(p+ε)n⌉]
      // (strict upper end: x's minimum attained rank is rankLo + 1).
      val rankLo = sorted.count(_ < x)
      val rankHi = sorted.count(_ <= x)
      assert(rankLo < math.ceil((p + eps) * n) &&
        rankHi >= math.floor((p - eps) * n),
        s"p=$p: value $x rank interval [$rankLo,$rankHi] outside " +
          s"±ε·n of ${p * n} (n=$n, ε=$eps)")
    }
    // And the merged result stays value-close to the single-sketch
    // (no-merge) path: both obey the same ε contract, so they can
    // differ only within the sketch resolution.
    val single = li.coalesce(1).agg(sketch(col("v"))).head()
      .getSeq[Double](0)
    pcts.indices.foreach { i =>
      val rel = math.abs(vals(i) - single(i)) / single(i)
      assert(rel <= 0.05,
        s"p=${pcts(i)}: merged ${vals(i)} vs single-pass ${single(i)}")
    }
  }

  test("q49 approx_percentile rank contract holds at p50/p95 per group (sf0.01)") {
    val q = graft.SparkEntry.queries("q49_approx_quantiles")
    val rows = q(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      for (p <- Seq("p50", "p95")) {
        assert(r.getAs[Boolean](s"${p}_rank_ok"),
          s"group $flag $p: returned value's rank outside ±ε·n " +
            s"(n=${r.getAs[Long]("n")}, accuracy=1000 ⇒ ε=0.001)")
      }
    }
  }
}
