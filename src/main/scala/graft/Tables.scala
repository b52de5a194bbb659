package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All tables are plain parquet. `events.ts` has shipped in two
  * different physical layouts across testdata generations:
  *
  *   - TIMESTAMP(NANOS): Spark cannot map nanos to its microsecond
  *     TimestampType, so the session must set the
  *     `spark.sql.legacy.parquet.nanosAsLong` escape hatch; the column
  *     then reads as LongType nanos and we floor-divide to µs (the
  *     floor matches DuckDB's TIMESTAMP_NS → TIMESTAMP cast for
  *     positive epochs, so µs-level oracle compares agree).
  *   - TIMESTAMP(MICROS) without the UTC-adjusted flag: reads natively
  *     as TimestampNTZType; we cast to the session-zone TimestampType
  *     (identity on the stored micros under the UTC session every
  *     graft entrypoint pins), which is the type the DuckDB oracle's
  *     naive TIMESTAMP compares against.
  *
  * Rather than hard-code either layout, [[repairEventsTs]] inspects the
  * dtype the scan actually produced and applies the matching repair —
  * a data drift now surfaces as a loud unknown-layout error, never a
  * silently rescaled clock. [[Canary]] additionally sanity-bounds the
  * decoded values before the full verification gates run.
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

  /** Normalise an `events` frame so `ts` is Spark's native
    * TimestampType (µs), whatever physical layout the scan produced.
    * Shared by the batch loader and the streaming source — the single
    * source of truth for the ts repair.
    */
  def repairEventsTs(df: DataFrame): DataFrame = {
    val repaired: Column = df.schema("ts").dataType match {
      // nanosAsLong escape hatch (TIMESTAMP(NANOS) layout): floor ns→µs.
      case LongType => timestamp_micros(expr("ts div 1000"))
      // TIMESTAMP(MICROS) without isAdjustedToUTC: cast is identity on
      // the stored micros under the pinned UTC session.
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type $other — unknown parquet layout; " +
          "extend Tables.repairEventsTs for this testdata generation")
    }
    df.withColumn("ts", repaired)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** The on-disk schema of `events` as the current session would scan
    * it (footer-only read — cheap). Streaming sources need an explicit
    * schema up front; deriving it here keeps the stream and batch paths
    * reading identically.
    */
  def eventsOnDiskSchema(spark: SparkSession, dir: String): StructType = {
    // Keep the NANOS escape hatch available for old-layout data; a
    // no-op for MICROS files. Must stay set for the lifetime of plans
    // scanning a NANOS file (the scan consults SQLConf at action time).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events")).schema
  }

  /** Load one table. `events` gets `ts` normalised to TimestampType
    * via [[repairEventsTs]].
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      repairEventsTs(spark.read.parquet(path(dir, name)))
    } else {
      spark.read.parquet(path(dir, name))
    }
  }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
