package graft

import org.apache.spark.sql.functions._

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

  test("simhash functions available through engine SQL") {
    val r = engine.sql(
      """SELECT graft_simhash60(array('a', 'b')) s60,
                graft_simhash64(array('a', 'b')) s64""").head()
    assert(r.getLong(0) != 0L && r.getLong(1) != 0L)
  }

  test("dataframe operator facade: near-dup, kmeans, tfidf") {
    val docs = engine.table("documents")
    // Plant an exact duplicate of every document under doc_id+100000:
    // each planted pair MUST come back at Hamming 0, so the facade is
    // checked against a known answer, not just for absence of crashes.
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val planted = base.union(
      base.select(col("doc_id") + lit(100000L), col("text")))
    val nDocs = base.count()
    val plantedPairs = engine.simhashNearDup(planted)
      .filter(col("doc_b") - col("doc_a") === 100000L &&
        col("hamming") === 0)
      .count()
    assert(plantedPairs >= nDocs, s"$plantedPairs planted pairs < $nDocs docs")
    val e = engine.sql(
      """SELECT vec_id, label,
           transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings""")
    assert(engine.kmeansIterate(e).count() > 0)
    assert(engine.tfidfTop(docs, k = 1).count() > 0)
  }
}
