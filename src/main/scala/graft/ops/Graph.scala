package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the TPC-H trade graph — the operator family a
  * corpus pipeline reaches for when documents/entities link to each
  * other (citation ranks for quality priors, influence scores for
  * source weighting).
  *
  * Everything here follows the integer-exact discipline: ranks live
  * in 10⁻¹² units as LONGs and every division is an integral DIV, so
  * the recurrence is a deterministic function of the edge set — both
  * engines run the IDENTICAL integer recurrence and the hash match is
  * exact, with no FP-order caveats anywhere.
  */
object Graph {

  /** Exact integer PageRank (q77) over the bipartite supplier↔customer
    * trade graph (edge per distinct supplied-to pair, both
    * directions, so no dangling-mass handling is needed: every node
    * with an out-edge has an in-edge).
    *
    * The recurrence (d = 0.85, all integral):
    *   base  = 10¹² DIV N
    *   r₀(u) = base
    *   rₖ(v) = (15·base) DIV 100 + (85·Σ_{u→v} rₖ₋₁(u) DIV outdeg(u)) DIV 100
    *
    * Scale shape: the classic edge-partitioned iteration — the edge
    * list (with out-degrees attached) materializes ONCE and each of
    * the `iters` rounds is one join keyed on src plus one dst-keyed
    * map-side-combining LONG sum; rank frames are node-sized and
    * localCheckpoint'd per round so the plan stays flat (a deployment
    * persists exactly these two artifacts). Nothing ever enumerates
    * paths; cost per round is |E| join + |E|→|V| aggregate.
    */
  def pageRank(lineitem: DataFrame, orders: DataFrame,
      iters: Int = 10, k: Int = 25): DataFrame = {
    val s = lineitem.sparkSession
    import s.implicits._
    val cps = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(); cps += c; c
    }
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct()
    // Disjoint node ids: supplier 2k, customer 2k+1.
    val edges0 = pairs
      .select((col("sk") * 2).as("src"), (col("ck") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("ck") * 2 + 1).as("src"), (col("sk") * 2).as("dst")))
    val outdeg = edges0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edges = cp(edges0.join(outdeg, "src"))
    val nodes = cp(edges.select(col("src").as("node")).distinct())
    val n = nodes.count()
    if (n == 0L) {
      cps.foreach(Similarity.freeCheckpoint)
      return Seq.empty[(Int, String, Long, Long)]
        .toDF("rnk", "node_type", "node_id", "r")
    }
    val base = 1000000000000L / n
    val teleport = (15L * base) / 100L
    var ranks = cp(nodes.select(col("node"), lit(base).as("r")))
    for (it <- 1 to iters) {
      val insum = edges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("insum"))
      ranks = nodes.join(insum, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"${teleport}L + (85 * coalesce(insum, 0L)) div 100")
            .as("r"))
      // Flatten the lineage every third round: per-round eager
      // checkpoints cost a full job each, while three chained rounds
      // plan fine and run as one.
      if (it % 3 == 0 || it == iters) ranks = cp(ranks)
    }
    // The result is bounded (k rows): materialize it and FREE every
    // checkpoint block — a bench/session running many queries must
    // not inherit this op's working set.
    val out = ranks.orderBy(col("r").desc, col("node")).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("r").desc, col("node"))))
      .select(col("rnk"),
        expr("CASE WHEN node % 2 = 0 THEN 'supplier' " +
          "ELSE 'customer' END").as("node_type"),
        expr("node div 2").as("node_id"), col("r"))
      .orderBy("rnk")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    cps.foreach(Similarity.freeCheckpoint)
    out.toSeq.toDF("rnk", "node_type", "node_id", "r")
  }

  /** The q77 oracle: the identical integer recurrence with the
    * iterations unrolled as MATERIALIZED CTEs (s37's convention —
    * each step references its predecessor, so default inlining would
    * expand the chain exponentially).
    */
  private[graft] def sqlPageRank(iters: Int, k: Int): String = {
    val steps = (1 to iters).map { it =>
      s"""r$it AS MATERIALIZED (
        SELECT n.node,
          (15 * (SELECT base FROM nb)) // 100 +
          (85 * COALESCE(i.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN (
          -- CAST: DuckDB's SUM(BIGINT) is HUGEINT, which would float
          -- through pandas; the mass fits BIGINT by construction.
          SELECT e.dst AS node,
            CAST(SUM(r.r // e.outdeg) AS BIGINT) AS insum
          FROM edges e JOIN r${it - 1} r ON r.node = e.src
          GROUP BY e.dst) i ON i.node = n.node)"""
    }.mkString(",\n        ")
    s"""
      WITH pairs AS (
        SELECT DISTINCT l.l_suppkey AS sk, o.o_custkey AS ck
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      edges0 AS (
        SELECT sk * 2 AS src, ck * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT ck * 2 + 1 AS src, sk * 2 AS dst FROM pairs),
      od AS (SELECT src, COUNT(*) AS outdeg FROM edges0 GROUP BY src),
      edges AS MATERIALIZED (
        SELECT e.src, e.dst, od.outdeg
        FROM edges0 e JOIN od ON od.src = e.src),
      nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
      nb AS (SELECT 1000000000000 // COUNT(*) AS base FROM nodes),
      r0 AS MATERIALIZED (
        SELECT node, (SELECT base FROM nb) AS r FROM nodes),
      $steps
      SELECT CAST(rnk AS INT) AS rnk,
        CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
          AS node_type,
        node // 2 AS node_id, CAST(r AS BIGINT) AS r
      FROM (
        SELECT node, r,
          ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rnk
        FROM r$iters)
      WHERE rnk <= $k
      ORDER BY rnk"""
  }

  /** BFS seed distance (q78) — the link-distance quality prior
    * web-corpus pipelines run (hop distance from a trusted seed set,
    * the harmonic-centrality-style signal behind crawl frontier
    * filtering), computed on the same trade graph: seeds are the
    * suppliers of nations 0-4 at distance 0, and `rounds` min-plus
    * relaxations propagate d(v) = min(d(v), min_{u→v} d(u)+1).
    * Pure integer min — deterministic in both engines by
    * construction. Unreached nodes keep the 999 sentinel.
    *
    * Scale shape: identical to [[pageRank]] — one src-keyed join and
    * one dst-keyed map-side-combining MIN per round over the
    * once-materialized edge list; distance frames are node-sized.
    * Output is the bounded (node_type, dist) histogram.
    */
  def seedDistance(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, rounds: Int = 6): DataFrame = {
    val s = lineitem.sparkSession
    import s.implicits._
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct()
    val edges0 = pairs
      .select((col("sk") * 2).as("src"), (col("ck") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("ck") * 2 + 1).as("src"), (col("sk") * 2).as("dst")))
    val cps = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(); cps += c; c
    }
    val edges = cp(edges0)
    val seeds = supplier.filter(col("s_nationkey") < 5)
      .select((col("s_suppkey") * 2).as("node"))
    val nodes = edges.select(col("src").as("node")).distinct()
    var dist = nodes.join(seeds.withColumn("z", lit(0)),
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("z"), lit(999)).as("dist"))
    for (it <- 1 to rounds) {
      val relaxed = edges.join(dist, col("src") === col("node"))
        .select(col("dst"), (col("dist") + 1).as("cand"))
        .groupBy("dst").agg(min("cand").as("reach"))
      dist = dist.join(relaxed, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("dist"), coalesce(col("reach"), lit(999)))
            .as("dist"))
      if (it % 3 == 0 || it == rounds) dist = cp(dist)
    }
    // Bounded histogram out; free the checkpoint working set (the
    // pageRank rule).
    val out = dist
      .select(expr("CASE WHEN node % 2 = 0 THEN 'supplier' " +
        "ELSE 'customer' END").as("node_type"), col("dist"))
      .groupBy("node_type", "dist")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("node_type", "dist")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    cps.foreach(Similarity.freeCheckpoint)
    out.toSeq.toDF("node_type", "dist", "n_nodes")
  }

  /** The q78 oracle: the identical min-plus relaxation unrolled
    * ([[sqlPageRank]]'s convention).
    */
  private[graft] def sqlSeedDistance(rounds: Int): String = {
    val steps = (1 to rounds).map { it =>
      s"""d$it AS MATERIALIZED (
        SELECT d.node,
          LEAST(d.dist, COALESCE(i.reach, 999)) AS dist
        FROM d${it - 1} d LEFT JOIN (
          SELECT e.dst AS node, MIN(r.dist + 1) AS reach
          FROM edges e JOIN d${it - 1} r ON r.node = e.src
          GROUP BY e.dst) i ON i.node = d.node)"""
    }.mkString(",\n        ")
    s"""
      WITH pairs AS (
        SELECT DISTINCT l.l_suppkey AS sk, o.o_custkey AS ck
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      edges AS MATERIALIZED (
        SELECT sk * 2 AS src, ck * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT ck * 2 + 1 AS src, sk * 2 AS dst FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      seeds AS (SELECT s_suppkey * 2 AS node FROM supplier
                WHERE s_nationkey < 5),
      d0 AS MATERIALIZED (
        SELECT n.node,
          CASE WHEN n.node IN (SELECT node FROM seeds)
               THEN 0 ELSE 999 END AS dist
        FROM nodes n),
      $steps
      SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
          AS node_type,
        CAST(dist AS INT) AS dist, COUNT(*) AS n_nodes
      FROM d$rounds
      GROUP BY 1, 2
      ORDER BY node_type, dist"""
  }

  /** Personalized PageRank (q81) — [[pageRank]] with the teleport
    * mass restricted to a TRUSTED SEED SET (q78's nation-0..4
    * suppliers): the canonical "influence relative to a trust core"
    * signal (TrustRank / personalized PR), the graph prior a corpus
    * pipeline uses to weight sources by proximity-weighted influence
    * rather than raw popularity. Identical integer discipline: seed
    * mass base = 10¹² DIV |seeds|, r₀ = base on seeds and 0
    * elsewhere, rₖ(v) = [v ∈ seeds]·(15·base) DIV 100 +
    * (85·Σ_{u→v} rₖ₋₁(u) DIV outdeg(u)) DIV 100 — every step
    * integral, so both engines run the identical recurrence.
    *
    * Scale shape: exactly [[pageRank]]'s — the seed membership joins
    * in as a broadcast flag on the node frame; nothing else changes.
    */
  def personalizedPageRank(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, iters: Int = 10, k: Int = 25): DataFrame = {
    val s = lineitem.sparkSession
    import s.implicits._
    val cps = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(); cps += c; c
    }
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct()
    val edges0 = pairs
      .select((col("sk") * 2).as("src"), (col("ck") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("ck") * 2 + 1).as("src"), (col("sk") * 2).as("dst")))
    val outdeg = edges0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edges = cp(edges0.join(outdeg, "src"))
    val seedIds = supplier.filter(col("s_nationkey") < 5)
      .select((col("s_suppkey") * 2).as("node"))
    val nodes = cp(edges.select(col("src").as("node")).distinct()
      .join(broadcast(seedIds.withColumn("z", lit(1))), Seq("node"), "left")
      .select(col("node"), coalesce(col("z"), lit(0)).as("is_seed")))
    val nSeeds = nodes.filter(col("is_seed") === 1).count()
    if (nSeeds == 0L) {
      cps.foreach(Similarity.freeCheckpoint)
      return Seq.empty[(Int, String, Long, Long)]
        .toDF("rnk", "node_type", "node_id", "r")
    }
    val base = 1000000000000L / nSeeds
    val teleport = (15L * base) / 100L
    var ranks = cp(nodes.select(col("node"),
      (col("is_seed") * base).as("r")))
    for (it <- 1 to iters) {
      val insum = edges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("insum"))
      ranks = nodes.join(insum, col("node") === col("dst"), "left")
        .select(col("node"), col("is_seed"),
          expr(s"is_seed * ${teleport}L + " +
            "(85 * coalesce(insum, 0L)) div 100").as("r"))
      if (it % 3 == 0 || it == iters) ranks = cp(ranks)
    }
    val out = ranks.orderBy(col("r").desc, col("node")).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("r").desc, col("node"))))
      .select(col("rnk"),
        expr("CASE WHEN node % 2 = 0 THEN 'supplier' " +
          "ELSE 'customer' END").as("node_type"),
        expr("node div 2").as("node_id"), col("r"))
      .orderBy("rnk")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    cps.foreach(Similarity.freeCheckpoint)
    out.toSeq.toDF("rnk", "node_type", "node_id", "r")
  }

  /** The q81 oracle: [[sqlPageRank]] with the seeded teleport. */
  private[graft] def sqlPersonalizedPageRank(iters: Int, k: Int): String = {
    val steps = (1 to iters).map { it =>
      s"""r$it AS MATERIALIZED (
        SELECT n.node, n.is_seed,
          n.is_seed * ((15 * (SELECT base FROM nb)) // 100) +
          (85 * COALESCE(i.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node,
            CAST(SUM(r.r // e.outdeg) AS BIGINT) AS insum
          FROM edges e JOIN r${it - 1} r ON r.node = e.src
          GROUP BY e.dst) i ON i.node = n.node)"""
    }.mkString(",\n        ")
    s"""
      WITH pairs AS (
        SELECT DISTINCT l.l_suppkey AS sk, o.o_custkey AS ck
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      edges0 AS (
        SELECT sk * 2 AS src, ck * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT ck * 2 + 1 AS src, sk * 2 AS dst FROM pairs),
      od AS (SELECT src, COUNT(*) AS outdeg FROM edges0 GROUP BY src),
      edges AS MATERIALIZED (
        SELECT e.src, e.dst, od.outdeg
        FROM edges0 e JOIN od ON od.src = e.src),
      seeds AS (SELECT s_suppkey * 2 AS node FROM supplier
                WHERE s_nationkey < 5),
      nodes AS MATERIALIZED (
        SELECT n.node,
          CASE WHEN n.node IN (SELECT node FROM seeds)
               THEN 1 ELSE 0 END AS is_seed
        FROM (SELECT DISTINCT src AS node FROM edges) n),
      nb AS (SELECT 1000000000000 // COUNT(*) AS base
             FROM nodes WHERE is_seed = 1),
      r0 AS MATERIALIZED (
        SELECT node, is_seed,
          is_seed * (SELECT base FROM nb) AS r FROM nodes),
      $steps
      SELECT CAST(rnk AS INT) AS rnk,
        CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
          AS node_type,
        node // 2 AS node_id, CAST(r AS BIGINT) AS r
      FROM (
        SELECT node, r,
          ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rnk
        FROM r$iters)
      WHERE rnk <= $k
        -- Spark returns EMPTY when the graph has no seed (nSeeds
        -- guard); without this gate, nb's 10^12 // 0 would be NULL
        -- and k NULL-rank rows would leak out.
        AND (SELECT COUNT(*) FROM nodes WHERE is_seed = 1) > 0
      ORDER BY rnk"""
  }

  /** Weakly-connected components (q80) — the graph tier's grouping
    * primitive (d08's min-label propagation is the same algorithm on
    * the near-dup graph; here it's registered as a first-class graph
    * query). The graph: the SAME-NATION trade graph — supplier↔
    * customer edges only where both sides share a nation, which
    * partitions the trade graph into per-nation clusters with real
    * component structure (the full graph is one giant component).
    *
    * `rounds` FIXED min-label relaxations: l₀(v) = v,
    * lₖ(v) = min(lₖ₋₁(v), min_{u→v} lₖ₋₁(u)). Pure integer MIN —
    * deterministic in both engines whether or not the propagation
    * has converged (the spec asserts actual convergence on the
    * testdata; the oracle match never depends on it). Output is the
    * bounded (component size → n_components) histogram.
    *
    * Scale shape: [[pageRank]]'s — one src-keyed join plus one
    * dst-keyed map-side-combining MIN per round over the
    * once-materialized edge list; label frames are node-sized;
    * lineage flattened every 3rd round; checkpoints freed after the
    * bounded histogram materializes. Label propagation is the WCC
    * algorithm that needs no union-find driver state — the classic
    * Pregel formulation.
    */
  def connectedComponents(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame,
      rounds: Int = 10): DataFrame = {
    val s = lineitem.sparkSession
    import s.implicits._
    val cps = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(); cps += c; c
    }
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"),
        col("s_nationkey").as("sn"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(customer.select(col("c_custkey"),
        col("c_nationkey").as("cn")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("sn") === col("cn"))
      .select(col("l_suppkey").as("sk"), col("o_custkey").as("ck"))
      .distinct()
    val edges = cp(pairs
      .select((col("sk") * 2).as("src"), (col("ck") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("ck") * 2 + 1).as("src"), (col("sk") * 2).as("dst"))))
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (it <- 1 to rounds) {
      val relaxed = edges.join(labels, col("src") === col("node"))
        .select(col("dst"), col("label").as("cand"))
        .groupBy("dst").agg(min("cand").as("nl"))
      labels = labels.join(relaxed, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label")))
            .as("label"))
      if (it % 3 == 0 || it == rounds) labels = cp(labels)
    }
    // Bounded (size → count) histogram out; free the working set.
    val out = labels.groupBy("label").agg(count(lit(1)).as("c_size"))
      .groupBy("c_size").agg(count(lit(1)).as("n_components"))
      .orderBy("c_size")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    cps.foreach(Similarity.freeCheckpoint)
    out.toSeq.toDF("c_size", "n_components")
  }

  /** The q80 oracle: the identical fixed-round min-label relaxation
    * unrolled as MATERIALIZED CTEs ([[sqlPageRank]]'s convention).
    */
  private[graft] def sqlConnectedComponents(rounds: Int): String = {
    val steps = (1 to rounds).map { it =>
      s"""l$it AS MATERIALIZED (
        SELECT d.node,
          LEAST(d.label, COALESCE(i.nl, d.label)) AS label
        FROM l${it - 1} d LEFT JOIN (
          SELECT e.dst AS node, MIN(r.label) AS nl
          FROM edges e JOIN l${it - 1} r ON r.node = e.src
          GROUP BY e.dst) i ON i.node = d.node)"""
    }.mkString(",\n        ")
    s"""
      WITH pairs AS (
        SELECT DISTINCT l.l_suppkey AS sk, o.o_custkey AS ck
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE s.s_nationkey = c.c_nationkey),
      edges AS MATERIALIZED (
        SELECT sk * 2 AS src, ck * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT ck * 2 + 1 AS src, sk * 2 AS dst FROM pairs),
      l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS label FROM edges),
      $steps
      SELECT c_size, COUNT(*) AS n_components FROM (
        SELECT label, COUNT(*) AS c_size FROM l$rounds GROUP BY label)
      GROUP BY c_size
      ORDER BY c_size"""
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q77_pagerank",
      (s, dir) =>
        // Exact integer PageRank (see [[pageRank]]): 10 rounds over
        // the supplier↔customer trade graph, top-25 by rank.
        pageRank(Tables.load(s, dir, "lineitem"),
          Tables.load(s, dir, "orders")),
      Some(sqlPageRank(iters = 10, k = 25))),
    // ----------------------------------------------------------------
    Q(
      "q78_seed_distance",
      (s, dir) =>
        // BFS seed distance (see [[seedDistance]]): hop distance
        // from nation-0..4 suppliers, 6 min-plus rounds, histogram out.
        seedDistance(Tables.load(s, dir, "lineitem"),
          Tables.load(s, dir, "orders"),
          Tables.load(s, dir, "supplier")),
      Some(sqlSeedDistance(rounds = 6))),
    // ----------------------------------------------------------------
    Q(
      "q80_connected_components",
      (s, dir) =>
        // Weakly-connected components (see [[connectedComponents]]):
        // 10 min-label rounds on the same-nation trade graph,
        // bounded (component size → count) histogram out.
        connectedComponents(Tables.load(s, dir, "lineitem"),
          Tables.load(s, dir, "orders"),
          Tables.load(s, dir, "customer"),
          Tables.load(s, dir, "supplier")),
      Some(sqlConnectedComponents(rounds = 10))),
    // ----------------------------------------------------------------
    Q(
      "q81_personalized_pagerank",
      (s, dir) =>
        // Personalized PageRank (see [[personalizedPageRank]]):
        // teleport mass restricted to the nation-0..4 supplier seed
        // set — trust-relative influence, top-25.
        personalizedPageRank(Tables.load(s, dir, "lineitem"),
          Tables.load(s, dir, "orders"),
          Tables.load(s, dir, "supplier")),
      Some(sqlPersonalizedPageRank(iters = 10, k = 25)))
  )
}
