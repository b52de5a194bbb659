package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** The composed real-world use: a training-data cleaning pipeline as
  * ONE declarative plan — quality gate → canonical-fingerprint dedup →
  * per-source stats. Because it's a single DataFrame expression,
  * Catalyst fuses the stages (the tokenizer runs once, pruning reaches
  * the scan) — the reason to build pipelines in the engine instead of
  * chaining jobs through files.
  */
object Pipeline {

  val all: Seq[Q] = Seq(
    Q(
      "p01_clean_corpus",
      (s, dir) => {
        val scored = Tables.load(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("stop_ratio",
            size(filter(col("toks"), t => t.isin("the", "a", "an", "and",
              "or", "of", "to", "in", "is"))).cast("double") /
              col("n_tokens"))
          // quality gate: long enough and stopword-bearing
          .filter(col("n_tokens") >= 20 && col("stop_ratio") > 0.0)
          .withColumn("fingerprint",
            md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))))
        // canonical dedup: survivor = min doc_id per fingerprint
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint")).orderBy(col("doc_id"))
        scored
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("total_tokens"),
            (sum(col("n_tokens")).cast("double") / count(lit(1)))
              .as("avg_tokens"))
          .orderBy("source")
      },
      sqlP01),
    // ----------------------------------------------------------------
    Q(
      "p02_crossmodal_topk",
      (s, dir) => {
        // Cross-modal composition: text-side quality gate, join the
        // embedding by id, similarity-rank the survivors against a
        // query vector. One declarative plan across both modalities;
        // the doc table never ships its text past the gate (projection
        // pruning), the embedding side shuffles only gated ids.
        graft.functions.VectorExpressions.register(s)
        val dot = (a: Column, b: Column) =>
          graft.functions.VectorExpressions.dot(a, b)
        val gated = Tables.load(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .filter(size(col("toks")) >= 40)
          .select("doc_id")
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), transform(col("embedding"),
            x => x.cast("double")).as("v"))
        val qv = e.filter(col("vec_id") === 0)
          .select(col("v").as("qv"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cos_sim").desc, col("doc_id"))
        e.join(gated, e("vec_id") === gated("doc_id"))
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("doc_id"),
            round(dot(col("qv"), col("v")) /
              (sqrt(dot(col("qv"), col("qv"))) *
                sqrt(dot(col("v"), col("v")))), 6).as("cos_sim"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .orderBy("rnk")
      },
      Some("""
        WITH gated AS (
          SELECT doc_id FROM documents
          WHERE text IS NOT NULL
            AND len(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> len(x) > 0)) >= 40),
        e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        scored AS (
          SELECT g.doc_id,
            ROUND(list_sum(list_transform(list_zip(qv.qv, e.v), p -> p[1]*p[2])) /
              (sqrt(list_sum(list_transform(qv.qv, x -> x*x))) *
               sqrt(list_sum(list_transform(e.v, x -> x*x)))), 6) AS cos_sim
          FROM e JOIN gated g ON e.vec_id = g.doc_id
          CROSS JOIN qv
          WHERE e.vec_id <> 0)
        SELECT doc_id, cos_sim, rnk FROM (
          SELECT doc_id, cos_sim,
            ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rnk
          FROM scored)
        WHERE rnk <= 10
        ORDER BY rnk"""))
  )

  private def sqlP01: Option[String] = Some("""
        WITH scored AS (
          SELECT doc_id, source, tl,
            len(tl) AS n_tokens,
            CAST(len(list_filter(tl, x -> x IN ('the','a','an','and','or',
              'of','to','in','is'))) AS DOUBLE) / len(tl) AS stop_ratio
          FROM (SELECT doc_id, source,
                  list_filter(string_split_regex(lower(text), '\s+'),
                              x -> len(x) > 0) AS tl
                FROM documents)),
        gated AS (
          SELECT doc_id, source, n_tokens,
            md5(array_to_string(list_sort(list_distinct(tl)), ' ')) AS fingerprint
          FROM scored
          WHERE n_tokens >= 20 AND stop_ratio > 0.0),
        kept AS (
          SELECT source, n_tokens FROM (
            SELECT source, n_tokens,
              ROW_NUMBER() OVER (PARTITION BY fingerprint
                                 ORDER BY doc_id) AS rn
            FROM gated) WHERE rn = 1)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
          CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
        FROM kept
        GROUP BY source
        ORDER BY source""")
}
