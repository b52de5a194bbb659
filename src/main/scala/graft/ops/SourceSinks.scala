package graft.ops

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checked round trips through the non-parquet sources/sinks
  * (SURVEY §2.2 "sources/sinks beyond parquet"): each query WRITES a
  * projection through the format under test, READS it back with an
  * explicit schema, and aggregates — the DuckDB oracle computes the
  * same aggregate straight from the parquet table, so the hash matches
  * iff the round trip is value-lossless. (The format-specific
  * machinery — headers, JSON field mapping, ORC stripes — is what's
  * being exercised; the aggregate just makes the comparison small.)
  *
  * Money columns are cast to DECIMAL(12,2) BEFORE writing: text
  * formats round-trip decimals exactly by construction, with no
  * dependence on double-repr shortest-printing.
  *
  * Scale note: these deliberately write a FILTERED projection (the
  * pattern of a format-conversion job's verification pass, not a full
  * re-materialization); the temp dir is per-invocation and task
  * parallelism follows the upstream partitioning.
  */
object SourceSinks {

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }

  // deleteOnExit only removes EMPTY directories — a filled temp dir
  // would leak per invocation in long-lived sessions (Bench runs each
  // query twice). A shutdown hook with a recursive delete actually
  // cleans up. (Shared with the streaming file-sink runner, st08.)
  private[graft] def tmp(prefix: String): File = {
    val d = Files.createTempDirectory(prefix).toFile
    sys.addShutdownHook(deleteRecursively(d))
    d
  }

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q43_csv_roundtrip",
      (s, dir) => {
        val path = new File(tmp("graft_q43"), "lineitem_csv").getAbsolutePath
        t(s, dir)("lineitem")
          .filter(col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast("decimal(12,2)").as("qty"))
          .write.mode("overwrite").option("header", "true").csv(path)
        s.read
          .schema("l_orderkey BIGINT, l_returnflag STRING, qty DECIMAL(12,2)")
          .option("header", "true")
          .csv(path)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("qty")).cast("double").as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_quantity < 10
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),
    // ----------------------------------------------------------------
    Q(
      "q44_json_roundtrip",
      (s, dir) => {
        val path = new File(tmp("graft_q44"), "orders_json").getAbsolutePath
        t(s, dir)("orders")
          .filter(col("o_totalprice") > 200000)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("decimal(12,2)").as("price"))
          .write.mode("overwrite").json(path)
        s.read
          .schema("o_orderkey BIGINT, o_orderstatus STRING, price DECIMAL(12,2)")
          .json(path)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            max(col("price")).cast("double").as("max_price"),
            sum(col("price")).cast("double").as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
          CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_totalprice > 200000
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),
    // ----------------------------------------------------------------
    Q(
      "q45_orc_roundtrip",
      (s, dir) => {
        val path = new File(tmp("graft_q45"), "part_orc").getAbsolutePath
        t(s, dir)("part")
          .filter(col("p_size") < 20)
          .select(col("p_partkey"), col("p_brand"),
            col("p_retailprice").cast("decimal(12,2)").as("price"))
          .write.mode("overwrite").orc(path)
        s.read.orc(path) // ORC is self-describing — schema from stripes
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum(col("price")).cast("double").as("sum_price"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM part
        WHERE p_size < 20
        GROUP BY p_brand
        ORDER BY p_brand""")),
    // ----------------------------------------------------------------
    Q(
      "q50_xml_roundtrip",
      (s, dir) => {
        // XML round trip through Spark 4's built-in XML source — the
        // same machinery the Discogs ETL reads with, exercised as a
        // general sink+source. Every row comes back (no aggregate):
        // the compare is direct value-losslessness on all 25 rows.
        val path = new File(tmp("graft_q50"), "nation_xml").getAbsolutePath
        t(s, dir)("nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .write.mode("overwrite")
          .option("rowTag", "nation").option("rootTag", "nations")
          .format("xml").save(path)
        s.read
          .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
          .option("rowTag", "nation")
          .format("xml").load(path)
          .orderBy("n_nationkey")
      },
      Some("""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation
        ORDER BY n_nationkey""")),
    // ----------------------------------------------------------------
    Q(
      "q63_bucketed_join",
      (s, dir) => {
        // Bucketed CO-LOCATED join — the table-LAYOUT optimization
        // for repeated 100 TB fact-fact joins: both sides bucketed
        // (and sorted) by the join key into the same bucket count, so
        // the SortMergeJoin reads bucket i of each side in task i
        // with ZERO join-side Exchange (plan-pinned; the merge hint
        // keeps the small-SF side from degenerating to a broadcast,
        // which would hide the property under test — at real scale
        // neither fact side broadcasts anyway). Bucketed copies are
        // written once per session+SF (ivfSq8TrainShared's shared-
        // artifact discipline); a deployment maintains them as the
        // table's standing layout, amortized over every consumer.
        import D.{dbl, m, r}
        // Table names carry the JVM pid: two concurrent sessions
        // (e.g. a Bench and a Verify on the same repo) share the
        // default warehouse dir, and a dir-only tag would let one
        // session's leftover-location cleanup delete the OTHER's
        // live table files out from under a running scan.
        val tag = java.lang.Integer.toHexString(dir.hashCode) +
          "_p" + ProcessHandle.current().pid()
        val lt = s"li_bucketed_$tag"
        val ot = s"ord_bucketed_$tag"
        this.synchronized {
          // Guard on BOTH tables: a first run that failed between the
          // two writes must not wedge the session on the missing one.
          if (!s.catalog.tableExists(lt) || !s.catalog.tableExists(ot)) {
            // A dead process with OUR pid (pid reuse) can linger in
            // the warehouse dir while this session's in-memory
            // catalog starts empty — CTAS refuses a non-empty
            // location, so clear OUR leftovers first (never another
            // live session's: the pid in the name is ours).
            val wh = new java.net.URI(
              s.conf.get("spark.sql.warehouse.dir")).getPath
            Seq(lt, ot).foreach { n =>
              if (!s.catalog.tableExists(n)) {
                val f = new File(wh, n)
                if (f.exists()) deleteRecursively(f)
              }
            }
            if (!s.catalog.tableExists(lt))
              t(s, dir)("lineitem")
                .select(col("l_orderkey"), col("l_extendedprice"),
                  col("l_discount"))
                .write.format("parquet").bucketBy(8, "l_orderkey")
                .sortBy("l_orderkey").mode("overwrite").saveAsTable(lt)
            if (!s.catalog.tableExists(ot))
              t(s, dir)("orders")
                .select(col("o_orderkey"), col("o_orderpriority"))
                .write.format("parquet").bucketBy(8, "o_orderkey")
                .sortBy("o_orderkey").mode("overwrite").saveAsTable(ot)
            // pid-named dirs would otherwise pile up across runs —
            // same recursive-delete-on-exit discipline as tmp().
            Seq(lt, ot).foreach(n => sys.addShutdownHook(
              deleteRecursively(new File(wh, n))))
          }
        }
        s.table(lt).hint("merge")
          .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            dbl(sum(m(col("l_extendedprice")) *
              (lit(1) - r(col("l_discount"))))).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                   (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
            AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),
    // ----------------------------------------------------------------
    Q(
      "q68_schema_evolution",
      (s, dir) => {
        // SCHEMA EVOLUTION across parquet generations — the lake
        // staple every long-lived dataset crosses: generation 1 was
        // written before the `tier` column existed, generation 2
        // carries it, and ONE mergeSchema read serves both with
        // NULL-filled history (no rewrite of the old files — at
        // 100 TB, rewriting history for a column add is exactly what
        // the lake design exists to avoid). mergeSchema reconciles
        // footers at planning time (a files-count cost, not a data
        // cost); steady-state readers would pin the evolved schema
        // explicitly (q43's discipline) and skip the footer sweep —
        // this query IS the evolution-boundary read. The aggregate
        // proves both generations land in one frame: n counts all
        // rows, n_evolved counts only gen-2 (tier non-null), and the
        // DECIMAL sum spans both (D's exactness rules).
        val path =
          new File(tmp("graft_q68"), "cust_evolved").getAbsolutePath
        val base = t(s, dir)("customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").cast("decimal(12,2)").as("bal"))
        base.filter(col("c_custkey") % 2 === 0)
          .write.mode("overwrite").parquet(path + "/gen1")
        base.filter(col("c_custkey") % 2 === 1)
          .withColumn("tier",
            when(col("bal") >= 5000, lit("gold")).otherwise(lit("std")))
          .write.mode("overwrite").parquet(path + "/gen2")
        s.read.option("mergeSchema", "true")
          .parquet(path + "/gen1", path + "/gen2")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            count(col("tier")).as("n_evolved"),
            count(when(col("tier") === "gold", lit(1))).as("n_gold"),
            sum(col("bal")).cast("double").as("sum_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
          COUNT(CASE WHEN c_custkey % 2 = 1 THEN 1 END) AS n_evolved,
          COUNT(CASE WHEN c_custkey % 2 = 1
                      AND CAST(c_acctbal AS DECIMAL(12,2)) >= 5000
                THEN 1 END) AS n_gold,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
            AS sum_bal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""))
  )
}
