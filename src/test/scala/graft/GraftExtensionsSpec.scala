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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
