package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import D.{dbl, m, r}

/** Relational query surface over the TPC-H-ish testdata tables.
  *
  * The reference (`/root/reference/src/main.rs`) has no relational
  * operators at all — it is one linear XML→Parquet pipeline (SURVEY.md
  * §2.1). This module provides the §2.2 capability matrix through
  * plain declarative DataFrame code so Catalyst owns pushdown,
  * pruning, join strategy and AQE at scale:
  *
  *  - scans with filter/projection pushdown (q02)
  *  - aggregations with exact decimal arithmetic (q01, q06, q17, q20)
  *  - joins: broadcast-dim star joins (q03, q05), semi (q04, q07),
  *    anti (q08), scalar-subquery via broadcast cross join (q18)
  *  - windows: top-k per group (q09), running totals + lag (q10),
  *    rank/dense_rank (q11)
  *  - sort/limit (q12), set ops (q13), conditional agg (q14),
  *    distinct agg (q15), string (q16) and date (q17) functions,
  *    rollup (q19), having (q20)
  *  - events: JSON extraction (q21), tumbling windows (q22),
  *    sessionization (q23), keep-first dedup (q24)
  *
  * Scale notes (100 TB): every dimension join below is an explicit
  * `broadcast()` (region/nation/supplier/part/customer are small or
  * bounded); the only big-big shuffle joins are lineitem⋈orders on
  * their natural keys, which at scale would be bucket-co-located;
  * aggregates are partial+final (map-side combine) automatically.
  */
object Relational {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Revenue column: extendedprice * (1 - discount), exact decimal. */
  private def revenue(df: DataFrame) =
    m(df("l_extendedprice")) * (lit(1) - r(df("l_discount")))

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir)("lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dbl(sum(m(col("l_quantity")))).as("sum_qty"),
            dbl(sum(m(col("l_extendedprice")))).as("sum_base_price"),
            dbl(sum(revenue(li))).as("sum_disc_price"),
            dbl(sum(revenue(li) * (lit(1) + r(col("l_tax"))))).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
          COUNT(*) AS count_order,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),
    // ----------------------------------------------------------------
    Q(
      "q02_filter_pushdown",
      (s, dir) => {
        t(s, dir)("lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_quantity") < 25)
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_shipdate")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_quantity < 25""")),
    // ----------------------------------------------------------------
    Q(
      "q03_revenue_by_segment",
      (s, dir) => {
        val c = t(s, dir)("customer")
        val o = t(s, dir)("orders")
          .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        val li = t(s, dir)("lineitem")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            dbl(sum(revenue(li))).as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
          COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),
    // ----------------------------------------------------------------
    Q(
      "q04_priority_semi_join",
      (s, dir) => {
        val o = t(s, dir)("orders")
        val big = t(s, dir)("lineitem").filter(col("l_quantity") > 45)
        o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),
    // ----------------------------------------------------------------
    Q(
      "q05_nation_revenue",
      (s, dir) => {
        val re = t(s, dir)("region").filter(col("r_name") === "EUROPE")
        val n = t(s, dir)("nation")
        val c = t(s, dir)("customer")
        val o = t(s, dir)("orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = t(s, dir)("lineitem")
        val su = t(s, dir)("supplier")
        // Star join: fact lineitem⋈orders shuffles on orderkey; all
        // dimension sides broadcast. supplier⋈customer nation equality
        // implements TPC-H Q5's "local supplier" semantics.
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(c),
            o("o_custkey") === c("c_custkey") &&
              su("s_nationkey") === c("c_nationkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(re), n("n_regionkey") === re("r_regionkey"))
          .groupBy("n_name")
          .agg(dbl(sum(revenue(li))).as("revenue"))
          .orderBy("n_name")
      },
      Some("""
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY n_name""")),
    // ----------------------------------------------------------------
    Q(
      "q06_forecast_revenue",
      (s, dir) => {
        t(s, dir)("lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
              col("l_quantity") < 24)
          .agg(dbl(sum(m(col("l_extendedprice")) * r(col("l_discount"))))
            .as("revenue"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24""")),
    // ----------------------------------------------------------------
    Q(
      "q07_big_spenders_semi",
      (s, dir) => {
        val c = t(s, dir)("customer")
        val bigOrders = t(s, dir)("orders").filter(col("o_totalprice") > 400000)
        c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey""")),
    // ----------------------------------------------------------------
    Q(
      "q08_orderless_anti_join",
      (s, dir) => {
        val c = t(s, dir)("customer")
        val o = t(s, dir)("orders")
          .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate < TIMESTAMP '1996-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),
    // ----------------------------------------------------------------
    Q(
      "q09_topk_per_customer",
      (s, dir) => {
        // Top-k per group: the scalable pattern (single shuffle on the
        // partition key, no global sort).
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir)("orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3""")),
    // ----------------------------------------------------------------
    Q(
      "q10_running_totals",
      (s, dir) => {
        // Ordering tuple: the testdata reuses (orderkey, linenumber)
        // pairs at larger SFs, so quantity joins the tie-break — any
        // remaining ties are then identical in every output column and
        // their mutual order is unobservable.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
        t(s, dir)("lineitem")
          .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
            "l_quantity")
          .withColumn("rn", row_number().over(w))
          .withColumn("running_qty",
            dbl(sum(m(col("l_quantity")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
          .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      },
      Some("""
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
          ROW_NUMBER() OVER w AS rn,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER
            (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
          LAG(l_quantity, 1) OVER w AS prev_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)""")),
    // ----------------------------------------------------------------
    Q(
      "q11_rank_parts",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc)
        t(s, dir)("part")
          .select("p_brand", "p_partkey", "p_retailprice")
          .withColumn("price_rank", rank().over(w))
          .withColumn("price_dense_rank", dense_rank().over(w))
      },
      Some("""
        SELECT p_brand, p_partkey, p_retailprice,
          RANK() OVER w AS price_rank,
          DENSE_RANK() OVER w AS price_dense_rank
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)""")),
    // ----------------------------------------------------------------
    Q(
      "q12_top10_orders",
      (s, dir) =>
        t(s, dir)("orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(10),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10""")),
    // ----------------------------------------------------------------
    Q(
      "q13_set_ops",
      (s, dir) => {
        val c = t(s, dir)("customer").select(col("c_nationkey").as("k"))
        val su = t(s, dir)("supplier").select(col("s_nationkey").as("k"))
        val n = t(s, dir)("nation").select(col("n_nationkey").as("k"))
        c.intersect(su).union(n.except(c)).distinct()
      },
      Some("""
        (SELECT c_nationkey AS k FROM customer
         INTERSECT
         SELECT s_nationkey AS k FROM supplier)
        UNION
        (SELECT n_nationkey AS k FROM nation
         EXCEPT
         SELECT c_nationkey AS k FROM customer)""")),
    // ----------------------------------------------------------------
    Q(
      "q14_promo_share",
      (s, dir) => {
        val li = t(s, dir)("lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        val p = t(s, dir)("part")
        val isPromo = when(p("p_type") === "PROMO", 1).otherwise(0)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(month(col("l_shipdate")).as("ship_month"))
          .agg(
            dbl(sum(revenue(li) * isPromo)).as("promo_revenue"),
            dbl(sum(revenue(li))).as("total_revenue"))
          .withColumn("promo_share",
            col("promo_revenue") / col("total_revenue"))
          .orderBy("ship_month")
      },
      Some("""
        WITH base AS (
          SELECT MONTH(l_shipdate) AS ship_month,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))
                     * CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS DOUBLE) AS promo_revenue,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY MONTH(l_shipdate))
        SELECT CAST(ship_month AS INT) AS ship_month, promo_revenue, total_revenue,
          promo_revenue / total_revenue AS promo_share
        FROM base ORDER BY ship_month""")),
    // ----------------------------------------------------------------
    Q(
      "q15_supplier_stats",
      (s, dir) => {
        // countDistinct beside plain aggs makes Catalyst plan an
        // Expand (every input row duplicated per aggregate group — a
        // 2× shuffle). The scalable shape is two-level re-aggregation:
        // first combine to (suppkey, partkey) — map-side partial
        // collapses duplicates BEFORE the shuffle — then count rows
        // per suppkey; both shuffles carry strictly fewer rows than
        // the input. The broadcast dim join moves AFTER aggregation,
        // touching 100 rows instead of 600 k.
        val li = t(s, dir)("lineitem")
        val su = t(s, dir)("supplier")
        val perPart = li
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(count(lit(1)).as("nl"), sum(m(col("l_quantity"))).as("sq"))
        val ag = perPart.groupBy("l_suppkey")
          .agg(
            count(lit(1)).as("n_parts"),
            sum(col("nl")).cast("long").as("n_lines"),
            dbl(sum(col("sq"))).as("sum_qty"))
        ag.join(broadcast(su), ag("l_suppkey") === su("s_suppkey"))
          .select(col("l_suppkey"), col("s_name"), col("n_parts"),
            col("n_lines"), col("sum_qty"))
          .orderBy("l_suppkey")
      },
      Some("""
        SELECT l_suppkey, s_name,
          COUNT(DISTINCT l_partkey) AS n_parts,
          COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY l_suppkey, s_name
        ORDER BY l_suppkey""")),
    // ----------------------------------------------------------------
    Q(
      "q16_string_projection",
      (s, dir) =>
        t(s, dir)("part")
          .filter(col("p_name").like("%a%"))
          .select(
            col("p_partkey"),
            upper(col("p_type")).as("type_up"),
            substring(col("p_name"), 1, 8).as("name8"),
            length(col("p_name")).as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(lower(col("p_name")), " ", "_").as("slug")),
      Some("""
        SELECT p_partkey,
          UPPER(p_type) AS type_up,
          SUBSTRING(p_name, 1, 8) AS name8,
          CAST(LENGTH(p_name) AS INT) AS name_len,
          CONCAT_WS('|', p_brand, p_type) AS brand_type,
          REPLACE(LOWER(p_name), ' ', '_') AS slug
        FROM part
        WHERE p_name LIKE '%a%'""")),
    // ----------------------------------------------------------------
    Q(
      "q17_orders_by_quarter",
      (s, dir) =>
        t(s, dir)("orders")
          .groupBy(
            year(col("o_orderdate")).as("o_year"),
            quarter(col("o_orderdate")).as("o_quarter"))
          .agg(
            count(lit(1)).as("n_orders"),
            dbl(sum(m(col("o_totalprice")))).as("sum_price"))
          .orderBy("o_year", "o_quarter"),
      Some("""
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
          CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY 1, 2
        ORDER BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q18_above_avg_orders",
      (s, dir) => {
        val o = t(s, dir)("orders")
        // price > 1.8*avg(price) rewritten shuffle-free and FP-free as
        // 5*price*count > 9*sum over exact decimals; the 1-row
        // aggregate broadcasts.
        val tot = o.agg(
          count(lit(1)).as("cnt"),
          sum(m(col("o_totalprice"))).as("total"))
        o.crossJoin(broadcast(tot))
          .filter(lit(5) * m(col("o_totalprice")) * col("cnt") >
            lit(9) * col("total"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE 5 * CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM orders)
              > 9 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders)
        ORDER BY o_orderkey""")),
    // ----------------------------------------------------------------
    Q(
      "q19_rollup_customers",
      (s, dir) => {
        val c = t(s, dir)("customer")
        val n = t(s, dir)("nation")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_customers"),
            dbl(sum(m(col("c_acctbal")))).as("sum_acctbal"))
          .select(
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("n_customers"), col("sum_acctbal"))
          .orderBy("nation", "segment")
      },
      Some("""
        SELECT COALESCE(n_name, 'ALL') AS nation,
          COALESCE(c_mktsegment, 'ALL') AS segment,
          COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)
        ORDER BY nation, segment""")),
    // ----------------------------------------------------------------
    Q(
      "q20_having_hot_parts",
      (s, dir) =>
        // Scale-free predicate (avg qty > 30 as sum > 30*count) so the
        // query stays meaningful at any SF.
        t(s, dir)("lineitem")
          .groupBy("l_partkey")
          .agg(
            count(lit(1)).as("n_lines"),
            sum(m(col("l_quantity"))).as("sum_qty_dec"))
          .filter(col("sum_qty_dec") > lit(30) * col("n_lines"))
          .select(col("l_partkey"), col("n_lines"),
            dbl(col("sum_qty_dec")).as("sum_qty"))
          .orderBy("l_partkey"),
      Some("""
        SELECT l_partkey, COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 30 * COUNT(*)
        ORDER BY l_partkey""")),
    // ----------------------------------------------------------------
    Q(
      "q21_events_json",
      (s, dir) =>
        // Schema'd from_json beats get_json_object (one parse, typed
        // extraction); repartition fans the CPU-bound parse out of the
        // single-file scan partition.
        t(s, dir)("events")
          .repartition(s.sparkContext.defaultParallelism, col("event_id"))
          .withColumn("k",
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k").cast("int"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(col("k")).cast("long").as("sum_k"),
            dbl(sum(m(col("value")))).as("sum_value"))
          .withColumn("avg_value", col("sum_value") / col("n"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),
    // ----------------------------------------------------------------
    Q(
      "q22_events_hourly",
      (s, dir) =>
        t(s, dir)("events")
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            dbl(sum(m(col("value")))).as("sum_value"))
          .orderBy("hour", "event_type"),
      Some("""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2""")),
    // ----------------------------------------------------------------
    Q(
      "q23_user_sessions",
      (s, dir) => {
        // Sessionization: gap > 30 min starts a new session. Work in
        // epoch µs (long) so arithmetic is integral and matches
        // DuckDB's ns→µs floor cast.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        t(s, dir)("events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("brk",
            when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1)
              .otherwise(0))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            (sum(col("brk")) + 1).cast("long").as("n_sessions"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        g AS (
          SELECT user_id,
            CASE WHEN us - LAG(us, 1) OVER (PARTITION BY user_id
                                            ORDER BY us, event_id) > 1800000000
                 THEN 1 ELSE 0 END AS brk
          FROM e)
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(brk) + 1 AS BIGINT) AS n_sessions
        FROM g GROUP BY user_id ORDER BY user_id""")),
    // ----------------------------------------------------------------
    Q(
      "q24_first_event_dedup",
      (s, dir) => {
        // Keep-first dedup: one shuffle on the dedup key; at scale
        // this beats dropDuplicates when a deterministic survivor is
        // required.
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir)("events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      },
      Some("""
        SELECT user_id, event_type, event_id, ts
        FROM (
          SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
            ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          FROM events)
        WHERE rn = 1
        ORDER BY user_id, event_type"""))
  )
}
