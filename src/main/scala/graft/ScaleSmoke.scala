package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scale smoke: replicate documents/embeddings ×N (with shifted
  * ids and perturbed texts so nothing degenerates into exact
  * duplicates) and time the heavy operators. Validates that the
  * dedup/similarity shapes scale ~linearly rather than quadratically.
  *
  * Usage: runMain graft.ScaleSmoke [factor]
  */
object ScaleSmoke {

  def scaled(base: DataFrame, idCol: String, factor: Int): DataFrame =
    (0 until factor).map { i =>
      base
        .withColumn(idCol, col(idCol) + lit(i.toLong * 1000000))
        .withColumn("text",
          if (base.columns.contains("text"))
            concat(col("text"), lit(s" variant$i"))
          else col(idCol) * 0 + lit(""))
    }.reduce(_ unionByName _)

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scale] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val docsN = scaled(docs1.select("doc_id", "text"), "doc_id", factor)
      .cache()
    println(s"[scale] documents: ${docsN.count()} rows (×$factor)")

    time(s"minhash bands ×1")(
      ops.Dedup.minhashBands(docs1.select("doc_id", "text"))
        .write.format("noop").mode("overwrite").save())
    time(s"minhash bands ×$factor")(
      ops.Dedup.minhashBands(docsN)
        .write.format("noop").mode("overwrite").save())
    time(s"lsh pairs ×$factor")(
      ops.Dedup.lshCandidatePairs(docsN, 0.5)
        .write.format("noop").mode("overwrite").save())
    time(s"simhash ×$factor")(
      ops.Dedup.simhashes(docsN)
        .write.format("noop").mode("overwrite").save())
    // Keeper election stays linear where pair enumeration is
    // quadratic in cluster size — the op to reach for on dup-heavy
    // corpora.
    time(s"keepers 1-hop ×$factor")(
      graft.SparkEntry.queries("d07_lsh_dedup_keepers")
        .apply(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save())
    time(s"keepers closure ×$factor")(
      ops.Dedup.connectedKeepers(docsN)
        .write.format("noop").mode("overwrite").save())
    docsN.unpersist()
    spark.stop()
  }
}
