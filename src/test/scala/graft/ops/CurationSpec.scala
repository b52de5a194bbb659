package graft.ops

import graft.SparkSpec

/** Functional checks for the curation operators whose semantics have
  * interesting edge cases beyond the DuckDB oracle gate (which runs
  * them at three SFs against real data).
  */
class CurationSpec extends SparkSpec {

  test("c09 fuzzy contamination: paraphrased leak flagged with its best bench match") {
    val sparkS = spark
    import sparkS.implicits._
    val bench = (1 to 30).map(i => f"w$i%02d").mkString(" ")
    // A "paraphrased" leak: the bench text with a token replaced —
    // the 3-grams around the edit all differ (exact-gram c05 loses
    // them), but minhash banding still collides.
    val leaked = bench.replace("w15", "edited")
    val df = Seq(
      (1L, "src0", bench), // the benchmark doc
      (2L, "src0", (100 to 130).map(i => s"b$i").mkString(" ")),
      (3L, "src1", leaked), // contaminated corpus doc
      (4L, "src1", (200 to 230).map(i => s"c$i").mkString(" ")),
      (5L, "src2", bench)) // verbatim copy in another source
      .toDF("doc_id", "source", "text")
    val out = Curation.fuzzyContamination(df, minJaccard = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // the verbatim copy reports Jaccard 1.0 against bench doc 1
    assert(out(5L) == ((1L, 1.0)), out)
    // the paraphrase is flagged against doc 1 with partial overlap
    assert(out(3L)._1 == 1L && out(3L)._2 > 0.3 && out(3L)._2 < 1.0, out)
    // clean corpus text and bench docs themselves are not reported
    assert(!out.contains(4L) && !out.contains(1L) && !out.contains(2L), out)
  }

  test("c09: best-match tie-break picks the smaller bench id") {
    val sparkS = spark
    import sparkS.implicits._
    val t = (1 to 25).map(i => f"q$i%02d").mkString(" ")
    // two IDENTICAL bench docs -> identical Jaccard; the report must
    // deterministically pick bench_id 1.
    val df = Seq(
      (1L, "src0", t), (2L, "src0", t), (3L, "src1", t))
      .toDF("doc_id", "source", "text")
    val out = Curation.fuzzyContamination(df, minJaccard = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 1L), out)
  }

  test("c11: the Morton interleave is a bijection over all 256 bucket pairs") {
    val sparkS = spark
    import sparkS.implicits._
    val pairs = for (bx <- 0 to 15; by <- 0 to 15) yield (bx, by)
    val z = pairs.toDF("bx", "by")
      .withColumn("z",
        org.apache.spark.sql.functions.expr(Curation.zFormula("div")))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toInt).toMap
    // injective onto [0, 255] — every pair gets a distinct z
    assert(z.values.toSet == (0 to 255).toSet, "z not a bijection")
    // bit layout: bx owns the odd bits, by the even — decode restores
    def decode(v: Int): (Int, Int) = {
      var (bx, by) = (0, 0)
      for (i <- 0 until 4) {
        bx |= ((v >> (2 * i + 1)) & 1) << i
        by |= ((v >> (2 * i)) & 1) << i
      }
      (bx, by)
    }
    z.foreach { case (p, v) => assert(decode(v) == p, s"$p -> $v") }
    // locality on the curve: an ALIGNED 16-long z-block is exactly
    // one 4x4 cell — both dims span exactly 4 consecutive values.
    // This is the property file skipping rests on (and why a writer
    // aligns shard boundaries to cell boundaries: unaligned ranges
    // cross the curve's quadrant jumps and lose the tight box).
    val byZ = z.map(_.swap)
    (0 until 256 by 16).foreach { lo =>
      val cells = (lo until lo + 16).map(byZ)
      assert(cells.map(_._1).max - cells.map(_._1).min == 3, s"block $lo")
      assert(cells.map(_._2).max - cells.map(_._2).min == 3, s"block $lo")
    }
  }

  test("c10: curriculum stages are balanced and monotone in quality") {
    val got = graft.SparkEntry
      .queries("c10_curriculum_stages")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4), got.toSeq)
    // ntile balance: stage sizes differ by at most 1
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1, got.toSeq)
    // quality is non-increasing across stages: each stage's max is at
    // most the previous stage's min (desc ordering)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._3, s"stage ${b._1} max > stage ${a._1} min: $a $b")
    }
  }

  test("packedCum equals the per-source running-sum window bit-for-bit") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // Three sources × 211 docs, token counts varied, and every 17th
    // count NULL — the null-skip semantics (chunk-leading NULL must
    // inherit the prior chunks' total; source-leading NULL stays
    // NULL) are the subtle part of the two-pass equivalence.
    val df = (for (s <- Seq("sa", "sb", "sc"); i <- 0 until 211)
      yield (s, i.toLong, (i * 37) % 101))
      .toDF("source", "doc_id", "n")
      .withColumn("n",
        when(col("doc_id") % 17 === 0, lit(null)).otherwise(col("n")))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Long.MinValue else r.getLong(2))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("n").cast("long")).over(w))
      .select("source", "doc_id", "cum").collect().map(key).toMap
    val got = Curation.packedCum(df, "n")
      .select("source", "doc_id", "cum").collect().map(key).toMap
    assert(got.size == expect.size)
    assert(got == expect,
      got.toSeq.sorted.zip(expect.toSeq.sorted)
        .filter(p => p._1 != p._2).take(10).toString)
  }

  test("tileSlices reproduces NTILE boundaries for every n/k shape") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // Values with heavy ties (so runs span tile boundaries), sizes
    // covering n<k, n=k, n%k!=0, n%k==0.
    for (n <- Seq(2, 4, 10, 23, 96); k <- Seq(4, 8)) {
      val rows = (0 until n).map(i => ((i * 7) % 5).toLong)
      val df = rows.toDF("v")
      val expect = df
        .withColumn("stage",
          ntile(k).over(Window.orderBy(col("v"))).cast("long"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_rows"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val byVal = df.groupBy("v").agg(count(lit(1)).as("cnt"))
      val withOff = byVal.as("a")
        .join(broadcast(byVal.as("b")), col("b.v") < col("a.v"), "left")
        .groupBy(col("a.v"), col("a.cnt"))
        .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
      val got = Curation.tileSlices(withOff, k)
        .groupBy("stage")
        .agg(sum(col("rows_in")).as("n_rows"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == expect, s"n=$n k=$k: $got vs $expect")
    }
  }

  test("c13 temperature mix: sqrt weighting up-weights the small " +
      "source and the allocation implies >1 epoch for it") {
    val sparkS = spark
    import sparkS.implicits._
    // 16:1 token ratio → sqrt weights 4:1 (0.8 / 0.2). Budget is
    // half of 17 = 8 tokens: A gets floor(6.4+0.5)=6 (0.375 epochs),
    // B gets floor(1.6+0.5)=2 — the mix REPEATS the small source
    // twice, the exact signal the operator exists to surface.
    val df = ((1 to 4).map(i => (i.toLong, "srcA",
        "t1 t2 t3 t4")) :+ (9L, "srcB", "solo"))
      .toDF("doc_id", "source", "text")
    val got = Curation.temperatureMix(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("srcA") == ((4L, 16L, 0.8, 6L, 0.375)), got("srcA"))
    assert(got("srcB") == ((1L, 1L, 0.2, 2L, 2.0)), got("srcB"))
  }

  test("c14 resample: the small source replicates 3x, the big one " +
      "hash-thins at its integer plan") {
    val sparkS = spark
    import sparkS.implicits._
    // same 16:1 corpus, full-budget allocation (17 tokens): srcA gets
    // alloc 14 -> copies 0, frac 87% (all four docs' buckets are
    // 47/12/31/3 < 87, so all admitted once); srcB gets alloc 3 ->
    // its single 1-token doc materializes exactly 3 times.
    val df = ((1 to 4).map(i => (i.toLong, "srcA",
        "t1 t2 t3 t4")) :+ (9L, "srcB", "solo"))
      .toDF("doc_id", "source", "text")
    val got = Curation.temperatureResample(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got("srcA") == ((0L, 87L, 4L, 16L, 14L, 1.142857)),
      got("srcA").toString)
    assert(got("srcB") == ((3L, 0L, 3L, 3L, 3L, 1.0)),
      got("srcB").toString)
  }

  test("c15: every near-dup family lands wholly in one split — and " +
      "the doc-hash split it replaces WOULD have leaked") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry
      .queries("c15_leakage_safe_split")(spark, "/root/testdata/sf0.001")
      .cache()
    // the invariant the operator exists for, and non-vacuously so
    assert(out.groupBy("family")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count() == 0)
    assert(out.groupBy("family").count()
      .filter(col("count") > 1).count() > 0)
    // c02's per-doc hash on the SAME corpus splits at least one
    // family across train/non-train — the leak c15 closes
    val docTrain = out.select(col("family"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100 < 80).cast("int").as("tr"))
    assert(docTrain.groupBy("family")
      .agg(countDistinct(col("tr")).as("k"))
      .filter(col("k") > 1).count() > 0)
    out.unpersist()
  }

  test("c17: the budget splits INSIDE a bucket by doc_id order") {
    // Four identical docs: same quality, same bucket, 4 tokens each.
    // Budget = 16 div 2 = 8 → docs 1,2 fit (cum 4, 8), docs 3,4
    // don't — the boundary-bucket window path decides ALL four rows,
    // so this pins the mid-bucket prefix semantics exactly.
    val sparkS = spark
    import sparkS.implicits._
    val docs = (1L to 4L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Curation.tokenBudgetSelect(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0), out.toString)
  }

  test("c17 on sf0.001 equals an independent global greedy recompute") {
    // The operator never sorts the corpus (histogram + boundary
    // window); this recomputes the SEMANTICS — one global sort by
    // (quality DESC, doc_id), prefix while cum <= total/2 — in plain
    // Scala and demands identical verdicts for every document.
    val dir = "/root/testdata/sf0.001"
    val scored = graft.SparkEntry.queries("t02_quality_score")(spark, dir)
      .collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
        r.getInt(1) >= 1 && r.getInt(2) >= 1)
      .map(r => (r.getLong(0), r.getInt(2).toLong, r.getDouble(7)))
    val budget = scored.map(_._2).sum / 2
    var cum = 0L
    val want = scored.sortBy { case (id, _, q) => (-q, id) }.map {
      case (id, n, _) => cum += n; id -> (if (cum <= budget) 1 else 0)
    }.toMap
    val got = graft.SparkEntry.queries("c17_token_budget")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got === want)
    // Non-vacuous both ways.
    assert(got.values.sum > 0 && got.values.sum < got.size)
  }

  test("c18: each source fills quality-first within the equal split, " +
      "independent of the other sources' mass") {
    val sparkS = spark
    import sparkS.implicits._
    // Source A: 4 identical 4-token docs (mass 16). Source B: two
    // 4-token docs of DIFFERENT quality — b-high has no punctuation,
    // b-low is punctuation-heavy. total = 24, alloc = 12 div 2 = 6:
    // each source admits exactly ONE doc — A's lowest doc_id (pure
    // tie-break), B's HIGHER-quality doc even though its doc_id is
    // larger (quality outranks id).
    val docs = Seq(
      (1L, "alpha beta gamma delta", "A"),
      (2L, "alpha beta gamma delta", "A"),
      (3L, "alpha beta gamma delta", "A"),
      (4L, "alpha beta gamma delta", "A"),
      (5L, "a!!! b??? c,,, d...", "B"),
      (6L, "the and of to", "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.sourceBudgetSelect(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0,
      5L -> 0, 6L -> 1), out.toString)
  }

  test("c19: at EQUAL quality the near-seed source wins budget the " +
      "far source loses — the graph prior is the only difference") {
    val sparkS = spark
    import sparkS.implicits._
    // The seed source src1 holds one doc. Source NEAR shares that
    // exact text (same minhash signature → shared band → 1 hop from
    // the seed); source FAR holds only its own text. NEAR and FAR
    // also hold identical FILLER MASS: 10 docs of 24 tokens each,
    // pairwise equal signal counts (same n_chars/n_tokens/n_stop/
    // n_punct → equal quality) but DIFFERENT words, so no band links
    // NEAR to FAR.
    // total = 486 tokens, budget = 243; weights 4/2/1 of Σ7 give
    // NEAR 69 tokens (2 filler docs) vs FAR 34 (1 filler doc).
    val seedText = "seedaa seedbb seedcc"
    def filler(tag: String) =
      (1 to 10).map(d => (1 to 24).map(i => f"$tag$d%02d$i%02d")
        .mkString(" "))
    val rows =
      Seq((1L, "src1", seedText), (2L, "NEAR", seedText)) ++
        filler("nr").zipWithIndex.map { case (t, i) =>
          (10L + i, "NEAR", t) } ++
        filler("fr").zipWithIndex.map { case (t, i) =>
          (30L + i, "FAR", t) }
    val docs = rows.toDF("doc_id", "source", "text")
    val out = Curation.graphBudgetSelect(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getInt(5)))
    // The prior: seed at 0, NEAR one hop, FAR unreachable.
    val distBySrc = out.map(t => t._2 -> t._3).toMap
    assert(distBySrc == Map("src1" -> 0, "NEAR" -> 1, "FAR" -> 9),
      distBySrc.toString)
    // Equal-quality filler, unequal admission: NEAR's larger
    // allocation admits strictly more filler tokens than FAR's.
    def admittedTokens(src: String) = out
      .filter(t => t._2 == src && t._1 >= 10L && t._5 == 1)
      .map(_._4).sum
    assert(admittedTokens("NEAR") > admittedTokens("FAR"),
      out.mkString("\n"))
  }

  test("c22: the low-core farm source loses budget to the clique at " +
      "equal token mass — coreness is the only difference") {
    val sparkS = spark
    import sparkS.implicits._
    // Source graph by construction: A, B, C share one identical
    // clique text (pairwise edges — a 2-core triangle); farm F
    // shares one text with A only (degree 1 — the h-index peels it
    // to coreness 1). Every source holds exactly 4 docs of 24 tokens
    // (96-token mass each), so allocation arithmetic alone fixes the
    // admitted counts: budget = 192, weights 3/3/3/2 (min(core+1,4)
    // of 2/2/2/1), Σw = 11 → clique alloc 52 admits 2 docs, farm
    // alloc 34 admits 1.
    def words(tag: String) =
      (1 to 24).map(i => f"$tag$i%02d").mkString(" ")
    val clique = words("cq")
    val farm = words("fm")
    val rows =
      Seq((1L, "A", clique), (2L, "B", clique), (3L, "C", clique),
        (4L, "A", farm), (5L, "F", farm)) ++
        Seq("A", "B", "C", "F").zipWithIndex.flatMap { case (src, s) =>
          val n = if (src == "A") 2 else 3
          (1 to n).map(d => (10L + s * 10 + d, src, words(s"u$s$d")))
        }
    val out = Curation.corenessBudgetSelect(rows.toDF(
      "doc_id", "source", "text")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(5)))
    val coreBySrc = out.map(t => t._1 -> t._2).toMap
    assert(coreBySrc == Map("A" -> 2L, "B" -> 2L, "C" -> 2L,
      "F" -> 1L), coreBySrc.toString)
    val admitted = out.groupBy(_._1).view
      .mapValues(_.count(_._3 == 1)).toMap
    assert(admitted == Map("A" -> 2, "B" -> 2, "C" -> 2, "F" -> 1),
      admitted.toString)
  }

  test("c20: the trained score gates admission — every target-domain " +
      "doc outranks every noisy doc at the budget cut") {
    val sparkS = spark
    import sparkS.implicits._
    // t28's ON-signal corpus shape: src1 long and punctuation-free,
    // the rest short and punctuation-heavy. Equal doc counts, so the
    // half-token budget can only be filled by score order: all src1
    // docs must admit before any noisy doc.
    val longClean = (1 to 60).map(i => f"word$i%03d").mkString(" ")
    val shortNoisy = "a!!! b??? c,,, d... e;;; f:::"
    val docs = (
      (1L to 4L).map(i => (i, longClean + s" tail$i", "src1")) ++
        (10L to 13L).map(i => (i, shortNoisy + s" g$i!!!", "srcA")))
      .toDF("doc_id", "text", "source")
    val out = Curation.classifierBudgetSelect(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    // The budget (half the total mass) is smaller than src1's mass,
    // so it fills INSIDE the high-score tier: everything admitted is
    // src1, no noisy doc sneaks in past a rejected src1 doc.
    val admitted = out.filter(_._2 == 1).keySet
    assert(admitted.nonEmpty && admitted.forall(_ <= 4L), out.toString)
    (10L to 13L).foreach(i =>
      assert(out(i) == 0, s"noisy doc $i admitted: $out"))
  }

  test("c21: the LM admits the predictable half — every repetitive " +
      "doc outranks every unseen-vocab doc at the budget cut") {
    val sparkS = spark
    import sparkS.implicits._
    // All ids avoid %10==0, so every doc trains the held-in KN model.
    // The pattern docs' bigrams repeat 60× across the slice (near-1
    // probabilities); the noise docs' bigrams are all singletons over
    // a disjoint vocabulary (continuation floors). Equal token counts
    // (30 each), so the half-mass budget fills with exactly the four
    // predictable docs.
    val pattern = Seq.fill(15)("the cat").mkString(" ")
    val docs = (
      (1L to 4L).map(i => (i, pattern, "src1")) ++
        (11L to 14L).map(i =>
          (i, (1 to 30).map(j => s"u${i}x$j").mkString(" "), "srcA")))
      .toDF("doc_id", "text", "source")
    val out = Curation.perplexityBudgetSelect(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out.filter(_._2 == 1).keySet == Set(1L, 2L, 3L, 4L),
      out.toString)
    (11L to 14L).foreach(i =>
      assert(out(i) == 0, s"noise doc $i admitted: $out"))
  }
}
