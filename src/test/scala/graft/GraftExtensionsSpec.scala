package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions path registers graft_dot for SQL") {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
    try {
      val v = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS v")
        .head().getDouble(0)
      assert(v == 11.0)
      // codegen path actually exercised (not just interpreted eval)
      val df = s2.range(1000).selectExpr(
        "graft_dot(array(cast(id as double), 2.0d), array(3.0d, 4.0d)) AS v")
      assert(df.agg(org.apache.spark.sql.functions.sum("v"))
        .head().getDouble(0) == 3.0 * (999 * 1000 / 2) + 8.0 * 1000)

      // Optimizer rule: the composable HOF dot-product pattern is
      // rewritten to the native expression. (Source must be
      // non-foldable or the whole projection constant-folds away
      // before the plan can be inspected.)
      val hof = s2.range(1)
        .selectExpr("array(cast(id as double) + 1.0d, 2.0d) AS a",
          "array(3.0d, 4.0d) AS b")
        .selectExpr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS d")
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        hof.queryExecution.optimizedPlan.toString)
      assert(hof.head().getDouble(0) == 11.0)

      // Ragged arrays: zip_with pads with nulls so the HOF form is
      // NULL — the rewrite must preserve that (guarded by a length
      // check), not return DotProduct's truncated partial sum.
      val ragged = s2.range(1)
        .selectExpr("array(cast(id as double) + 1.0d, 2.0d) AS a",
          "array(3.0d) AS b")
        .selectExpr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS d")
      assert(ragged.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        ragged.queryExecution.optimizedPlan.toString)
      assert(ragged.head().isNullAt(0),
        "ragged-array dot product must be NULL (HOF semantics)")

      // graft_winnow is injected too: fingerprints of a short string,
      // computed through plain SQL.
      val fp = s2.sql(
        "SELECT graft_winnow(encode('hello world hello', 'UTF-8')) AS f")
        .head().getSeq[Long](0)
      assert(fp.nonEmpty && fp == fp.sorted && fp.distinct == fp, fp.toString)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
