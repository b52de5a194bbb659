package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All tables are plain parquet; `events.ts` is written as
  * TIMESTAMP(NANOS) which Spark cannot map to its microsecond
  * TimestampType directly, so we read it via the
  * `spark.sql.legacy.parquet.nanosAsLong` escape hatch and convert.
  * The conversion intentionally truncates sub-microsecond nanos
  * (Spark's TimestampType tops out at µs); `ts div 1000` floors, which
  * is consistent with DuckDB's TIMESTAMP_NS → TIMESTAMP cast for
  * positive epochs, so µs-level oracle compares agree. Oracles over
  * `events.ts` must cast to µs (`CAST(ts AS TIMESTAMP)`) on the DuckDB
  * side too.
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loader keeps the scan declarative (`spark.read.parquet`) so
  * Catalyst's pushdown/pruning applies to every downstream query.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Load one table. `events` gets its ns-timestamp repaired to
    * Spark's native TimestampType (µs).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The NANOS escape hatch must stay set for the lifetime of any
      // plan that scans `events` (the scan consults SQLConf again at
      // action time, so save/restore around the read would break lazy
      // execution). Session builders in Verify/Bench/tests set it at
      // construction; this set is an idempotent backstop for ad-hoc
      // sessions. Known trade-off: after this, other NANOS parquet
      // columns in the same session would read as LongType instead of
      // failing loudly — only `events` uses NANOS in this dataset.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      // ts arrives as LongType nanos; integer-divide to µs (floor,
      // drops sub-µs nanos — see class doc) and rebuild a proper
      // timestamp column in place.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(path(dir, name))
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
