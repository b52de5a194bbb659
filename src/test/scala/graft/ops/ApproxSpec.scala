package graft.ops

import graft.SparkSpec

/** Pins the error bound of the HLL++ sketch query (q27): the sketch is
  * rows-only in the driver oracle (cross-engine sketch values differ by
  * design), so the accuracy claim lives here instead.
  */
class ApproxSpec extends SparkSpec {

  test("q27 approx_count_distinct rel_err <= 0.06 for every group (sf0.01)") {
    val q = graft.SparkEntry.queries("q27_approx_distinct")
    val rows = q(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val relErr = r.getAs[Double]("rel_err")
      val flag = r.getAs[String]("l_returnflag")
      assert(relErr <= 0.06,
        s"group $flag: rel_err $relErr exceeds 0.06 (rsd=0.02 requested)")
    }
  }

  test("q49 approx_percentile within 1% of exact at p50/p95 (sf0.01)") {
    val q = graft.SparkEntry.queries("q49_approx_quantiles")
    val rows = q(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      for (p <- Seq("p50", "p95")) {
        val exact = r.getAs[Double](s"exact_$p")
        val approx = r.getAs[Double](s"approx_$p")
        val relErr = math.abs(approx - exact) / exact
        assert(relErr <= 0.01,
          s"group $flag $p: approx $approx vs exact $exact (rel_err $relErr)")
      }
    }
  }
}
