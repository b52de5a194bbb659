package graft.functions

import graft.SparkSpec

/** Pins the Misra-Gries guarantee — every item with true frequency
  * > n/(k+1) survives, estimated within [f − n/(k+1), f] — on the
  * pure state machine (reduce/merge as plain calls, no Spark) and on
  * the distributed path.
  */
class HeavyHittersSpec extends SparkSpec {

  private def bound(agg: HeavyHittersAgg, k: Int,
      items: Seq[String], sketch: Map[String, Long]): Unit = {
    val n = items.size.toLong
    val f = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    f.foreach { case (v, fv) =>
      if (fv * (k + 1) > n) {
        assert(sketch.contains(v), s"heavy item $v (f=$fv, n=$n) missing")
        assert(sketch(v) <= fv, s"$v overcounted: ${sketch(v)} > $fv")
        assert(sketch(v) * (k + 1) >= fv * (k + 1) - n,
          s"$v undercounted past n/(k+1): ${sketch(v)} vs f=$fv, n=$n")
      }
    }
    assert(sketch.size <= k)
  }

  // 40% a, 24% b, 12% c, then a one-per-item tail — with k=4 the
  // heavy set at threshold n/5 is exactly {a, b}.
  private val items: Seq[String] =
    Seq.fill(1000)("a") ++ Seq.fill(600)("b") ++ Seq.fill(300)("c") ++
      (0 until 600).map(i => s"tail$i")

  test("MG bound holds after sequential reduce (single partition)") {
    val k = 4
    val agg = new HeavyHittersAgg(k)
    val sketch = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    bound(agg, k, items, sketch)
    assert(sketch.contains("a") && sketch.contains("b"))
  }

  test("MG bound survives merge of disjoint partial sketches") {
    val k = 4
    val agg = new HeavyHittersAgg(k)
    // Adversarial split: each partial sees a DIFFERENT distribution
    // (all of a's mass in one half, the tail in the other), so the
    // merge's counter-sum + (k+1)-th-largest subtraction does real
    // work rather than passing one side through.
    val parts = Seq(
      items.filter(_ == "a") ++ items.filter(_.startsWith("tail")).take(300),
      items.filterNot(v => v == "a" || v.startsWith("tail")) ++
        items.filter(_.startsWith("tail")).drop(300))
    assert(parts.map(_.size).sum == items.size)
    val merged = parts
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assert(merged.n == items.size.toLong)
    bound(agg, k, items, agg.finish(merged))
  }

  test("q60's distributed run finds every heavy hitter on sf0.001") {
    val out = graft.SparkEntry.queries("q60_heavy_hitters")
      .apply(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      out.mkString(", "))
  }
}
