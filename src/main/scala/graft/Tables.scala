package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * All tables are plain parquet; `events.ts` is written as
  * TIMESTAMP(NANOS) which Spark cannot map to its microsecond
  * TimestampType directly, so we read it via the
  * `spark.sql.legacy.parquet.nanosAsLong` escape hatch and convert
  * (the generated data is microsecond-precision, so the conversion is
  * lossless).
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
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      // ts arrives as LongType nanos; integer-divide to µs (exact for
      // this dataset) and rebuild a proper timestamp column in place.
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
