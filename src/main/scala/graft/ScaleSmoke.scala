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
      val shifted = base.withColumn(idCol, col(idCol) + lit(i.toLong * 1000000))
      if (base.columns.contains("text"))
        shifted.withColumn("text", concat(col("text"), lit(s" variant$i")))
      else shifted
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
      .config("spark.sql.legacy.sizeOfNull", "false")
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
    // SimHash near-dup: signature work is linear (one native call per
    // doc); pair work is bounded by band-bucket collisions. At ×N the
    // 15-bit band keyspace (32 768 per band) starts saturating, so
    // candidate counts — not the signature pass — are what to watch.
    time(s"simhash near-dup ×1")(
      ops.Dedup.simhashNearDup(docs1.select("doc_id", "text"))
        .write.format("noop").mode("overwrite").save())
    time(s"simhash near-dup ×$factor")(
      ops.Dedup.simhashNearDup(docsN)
        .write.format("noop").mode("overwrite").save())
    docsN.unpersist()

    // k-NN join: in-bucket pair count grows quadratically with bucket
    // population, so bits must scale with the corpus. Time the same
    // corpus under 4 and 8 bucket bits — the 8-bit run should not be
    // slower (it trades recall for candidate count).
    import graft.ops.Similarity
    graft.functions.VectorExpressions.register(spark)
    val emb1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val embN = scaled(emb1, "vec_id", factor).cache()
    println(s"[scale] embeddings: ${embN.count()} rows (×$factor)")
    // The SAME code s04 ships (Similarity.knnJoin), just swept over
    // bucket widths — so the smoke measures the shipped query's shape.
    def knn(bits: Int): Unit =
      Similarity.knnJoin(embN, bits, k = 3)
        .write.format("noop").mode("overwrite").save()
    time(s"knn join 4-bit ×$factor")(knn(4))
    time(s"knn join 8-bit ×$factor")(knn(8))
    embN.unpersist()
    spark.stop()
  }
}
