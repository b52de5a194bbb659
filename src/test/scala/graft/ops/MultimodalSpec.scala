package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("m05: same-size blocking pairs docs; exact payload clones flag is_dup") {
    val sparkS = spark
    import sparkS.implicits._
    graft.functions.VectorExpressions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("m05spec").toFile
    try {
      Seq(
        (1L, "hello world"), // 11 bytes
        (2L, "hello world"), // exact clone -> cos 1.0
        (3L, "jello wurld"), // same LENGTH, different content
        (4L, "tiny")) // different length: never blocked
        .toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("src1"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length(col("text")).cast("long"))
        .write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val out = graft.SparkEntry
        .queries("m05_feature_neardup")(spark, dir.getAbsolutePath)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(3), r.getInt(4)))).toMap
      // all three 11-byte docs pair up; only the true clone flags
      assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), out)
      assert(out((1L, 2L)) == ((1.0, 1)), out)
      assert(out((1L, 3L))._2 == 0 && out((2L, 3L))._2 == 0, out)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
