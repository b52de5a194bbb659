package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorExpressions

/** Similarity search over the `embeddings` table (Array[Float], 64-d).
  *
  *  - s01: brute-force cosine top-k — the correctness baseline, fully
  *    oracle-checked against DuckDB. O(|Q|·N) dot products as one
  *    broadcast join; the double-cast + sequential-fold dot product is
  *    bit-identical across engines.
  *  - s02: random-hyperplane LSH bucketing — the scale path for
  *    candidate generation: 16 sign bits → one int bucket; ANN search
  *    becomes an equi-join on bucket. Hyperplanes are derived
  *    deterministically from md5-digit parity so every executor (and
  *    the DuckDB oracle) agrees without shipping a model.
  *  - s03: IVF-style search — probe the nearest coarse centroid
  *    (here: per-label mean vectors, computed distributively via
  *    posexplode + groupBy), then brute-force only within that cell.
  *    At 100 TB this prunes the candidate set by ~|cells|×.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame = {
    VectorExpressions.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
  }

  /** Native codegen dot product (index-order sum — bit-identical to
    * the HOF fold and the DuckDB oracle; see DotProduct).
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Signed projections of each vector onto 16 deterministic
    * pseudo-random hyperplanes: (vec_id, label, b, d) with b the plane
    * index and d the exact-decimal projection. Weight for (plane b,
    * dim j) is ±1 from the parity of a portable md5 digit, so every
    * executor AND the DuckDB oracle reproduce the planes without
    * shipping a model. Shared by s02 (16-bit buckets) and d09 (banded
    * near-dup blocking).
    *
    * Shape: explode dims → broadcast-join the 1024-row plane table →
    * partial-agg per (vec, plane). All codegen (a first cut as nested
    * HOF folds was interpreted and ~8× slower). Projections sum exact
    * DECIMALs so the sign bit is reproducible under any aggregation
    * order.
    */
  def planeProjections(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    val dims = e.select(col("vec_id"), col("label"),
      posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"),
        (col("pos") + 1).cast("int").as("j"),
        col("x").cast("decimal(28,12)").as("xd"))
    val planes = s.range(16).select(col("id").cast("int").as("b"))
      .crossJoin(s.range(1, 65).select(col("id").cast("int").as("j")))
      .select(col("b"), col("j"),
        when(
          (conv(substring(md5(concat_ws(",", col("b"), col("j"))), 1, 1),
            16, 10).cast("int") % 2) === 0, 1)
          .otherwise(-1).as("w"))
    dims.join(broadcast(planes), "j")
      .groupBy("vec_id", "label", "b")
      .agg(sum(col("xd") * col("w")).as("d"))
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "s01_cosine_topk",
      (s, dir) => {
        // Norms precomputed per side: N + |Q| sqrt-folds instead of
        // 2·N·|Q| (the product sqrt(na)*sqrt(nb) is preserved exactly,
        // so the oracle's inline formula yields identical doubles).
        val e = emb(s, dir).withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qnrm"))
        // Query side is tiny → broadcast; one pass over the corpus,
        // then a per-query top-k window (shuffle on qid only).
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
        e.join(broadcast(queries), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
              .as("cos_sim"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .orderBy("qid", "rnk")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        scored AS (
          SELECT q.qid, e.vec_id,
            ROUND(
              list_sum(list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2])) /
              (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
               sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS cos_sim
          FROM e JOIN q ON e.vec_id <> q.qid)
        SELECT qid, vec_id, cos_sim, rnk FROM (
          SELECT qid, vec_id, cos_sim,
            ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        ORDER BY qid, rnk""")),
    // ----------------------------------------------------------------
    Q(
      "s02_lsh_buckets",
      (s, dir) => {
        // Bucket = the 16 sign bits of planeProjections packed into
        // one int.
        planeProjections(emb(s, dir))
          .groupBy("vec_id", "label")
          .agg(sum(when(col("d") >= 0, expr("shiftleft(1, b)")).otherwise(0))
            .cast("int").as("bucket"))
          .select("vec_id", "label", "bucket")
          .orderBy("vec_id")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        dims AS (
          SELECT vec_id, label, CAST(u.i AS INT) AS j,
            CAST(u.x AS DECIMAL(28,12)) AS xd
          FROM e, unnest(list_transform(range(1, len(v) + 1),
                                        i -> {'i': i, 'x': v[i]})) AS s(u)),
        planes AS (
          SELECT CAST(b.range AS INT) AS b, CAST(j.range AS INT) AS j,
            CASE WHEN CAST('0x' || substr(md5(CAST(b.range AS VARCHAR) || ','
                   || CAST(j.range AS VARCHAR)), 1, 1) AS INT) % 2 = 0
                 THEN 1 ELSE -1 END AS w
          FROM range(0, 16) b, range(1, 65) j),
        proj AS (
          SELECT vec_id, label, b, SUM(xd * w) AS d
          FROM dims JOIN planes USING (j)
          GROUP BY vec_id, label, b)
        SELECT vec_id, label,
          CAST(SUM(CASE WHEN d >= 0 THEN (1 << b) ELSE 0 END) AS INT) AS bucket
        FROM proj
        GROUP BY vec_id, label
        ORDER BY vec_id""")),
    // ----------------------------------------------------------------
    Q(
      "s03_ivf_topk",
      (s, dir) => {
        val e = emb(s, dir)
        // Coarse centroids: per-label per-dimension mean, computed
        // distributively (posexplode → groupBy(label, dim) → rebuild
        // vector with array_agg sorted by dim).
        // Exact-decimal mean per (label, dim): order-independent and
        // engine-independent, so the centroid doubles (and everything
        // ranked from them) hash-match the DuckDB oracle.
        val centroids = e
          .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("label", "dim")
          .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
            count(lit(1))).as("cx"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("dim"), col("cx"))))
            .as("pairs"))
          .select(col("label").as("c_label"),
            transform(col("pairs"), p => p.getField("cx")).as("cv"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        // Probe: nearest centroid per query (tiny cross join).
        val probe = queries.crossJoin(broadcast(centroids))
          .select(col("qid"), col("qv"), col("c_label"),
            cosine(col("qv"), col("cv")).as("c_sim"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("c_sim").desc, col("c_label"))))
          .filter(col("rn") === 1)
          .select(col("qid"), col("qv"), col("c_label").as("probe_label"))
        // Search only the probed cell — the IVF pruning step.
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
        e.join(broadcast(probe),
          col("label") === col("probe_label") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("probe_label"), col("vec_id"),
            round(cosine(col("qv"), col("v")), 6).as("cos_sim"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .orderBy("qid", "rnk")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        dims AS (
          SELECT label, CAST(u.i AS INT) AS dim, u.x AS x
          FROM e, unnest(list_transform(range(1, len(v) + 1),
                                        i -> {'i': i, 'x': v[i]})) AS s(u)),
        cent AS (
          SELECT label, list(cx ORDER BY dim) AS cv FROM (
            SELECT label, dim,
              CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cx
            FROM dims GROUP BY label, dim)
          GROUP BY label),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        probe AS (
          SELECT qid, qv, label AS probe_label FROM (
            SELECT q.qid, q.qv, c.label,
              ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                (list_sum(list_transform(list_zip(q.qv, c.cv), p -> p[1]*p[2])) /
                 (sqrt(list_sum(list_transform(q.qv, x -> x*x))) *
                  sqrt(list_sum(list_transform(c.cv, x -> x*x))))) DESC,
                c.label) AS rn
            FROM q CROSS JOIN cent c) WHERE rn = 1),
        scored AS (
          SELECT p.qid, p.probe_label, e.vec_id,
            ROUND(list_sum(list_transform(list_zip(p.qv, e.v), pr -> pr[1]*pr[2])) /
              (sqrt(list_sum(list_transform(p.qv, x -> x*x))) *
               sqrt(list_sum(list_transform(e.v, x -> x*x)))), 6) AS cos_sim
          FROM e JOIN probe p
            ON e.label = p.probe_label AND e.vec_id <> p.qid)
        SELECT qid, probe_label, vec_id, cos_sim, rnk FROM (
          SELECT qid, probe_label, vec_id, cos_sim,
            ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM scored)
        WHERE rnk <= 5
        ORDER BY qid, rnk"""))
  )
}
