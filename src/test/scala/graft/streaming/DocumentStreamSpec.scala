package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class DocumentStreamSpec extends SparkSpec {

  import DocumentStream._

  test("streaming near-dup equals the batch d11 pair set on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = runStreamNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = graft.ops.Dedup.simhashNearDup(
      graft.Tables.load(spark, dir, "documents"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("bucket state accumulates across micro-batches; blocking respected") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[DocSig]
    val q = nearDupPairs(input.toDS())
      .writeStream
      .format("memory")
      .queryName("neardup_test")
      .outputMode(OutputMode.Append())
      .start()

    // Batch 1: docs 1,2 share a bucket at Hamming 1; doc 9 is in the
    // same bucket but Hamming 10 (candidate, fails verify); doc 5 has
    // an identical signature to doc 1 but lives in ANOTHER bucket —
    // blocking must keep them apart.
    input.addData(
      DocSig(1, 0L, 0, 5), DocSig(2, 1L, 0, 5),
      DocSig(9, 0x3FFL, 0, 5), DocSig(5, 0L, 1, 7))
    q.processAllAvailable()
    val b1 = spark.table("neardup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(b1 == Set((1L, 2L, 1)))

    // Batch 2: doc 3 arrives later and must still pair against the
    // batch-1 state members (1 and 2), not just its own micro-batch.
    input.addData(DocSig(3, 3L, 0, 5))
    q.processAllAvailable()
    val b2 = spark.table("neardup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(b2 == Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 1)))
    q.stop()
    spark.catalog.dropTempView("neardup_test")
  }
}
