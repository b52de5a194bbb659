package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Dev-only micro profiler for pipeline stages (not part of the
  * contract surface).
  */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    import graft.ops.Dedup
    val b = Dedup.minhashBands(docs)
    time("bands noop")(b.write.format("noop").mode("overwrite").save())
    val pairs = b.as("a").join(b.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("pairs count")(pairs.count())
    val sh = Dedup.shingleRows(docs).groupBy("doc_id").agg(collect_set(col("t")).as("sl"))
    time("sh noop")(sh.write.format("noop").mode("overwrite").save())
    time("full d03")(Dedup.lshCandidatePairs(docs, 0.5).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
