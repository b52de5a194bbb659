package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      Some("""
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
        ORDER BY source"""))
  )
}
