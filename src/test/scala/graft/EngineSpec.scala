package graft

class EngineSpec extends SparkSpec {

  private lazy val engine = new Engine(spark, "/root/testdata/sf0.001")

  test("sql over registered tables") {
    assert(engine.sql("SELECT count(*) FROM lineitem").head().getLong(0) == 6000)
  }

  test("catalog query by name") {
    assert(engine.query("q01_pricing_summary").count() > 0)
  }

  test("unknown query name raises with the catalog listed") {
    val e = intercept[IllegalArgumentException](engine.query("nope"))
    assert(e.getMessage.contains("q01_pricing_summary"))
  }

  test("native functions available through engine SQL") {
    assert(engine.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) v")
      .head().getDouble(0) == 11.0)
  }
}
