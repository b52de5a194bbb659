package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  import EventStream._

  test("streaming hourly result equals batch result on the same data") {
    val dir = "/root/testdata/sf0.001"
    val streamed = runHourly(spark, dir).collect()
    val batch = hourlyCounts(
      graft.Tables.load(spark, dir, "events"))
      .orderBy("hour", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState accumulates per-user counts across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val q = runningCounts(input.toDS())
      .writeStream
      .format("memory")
      .queryName("running_counts_test")
      .outputMode(OutputMode.Update())
      .start()

    input.addData(Ev(1, 100, 1000), Ev(2, 100, 2000), Ev(3, 200, 1500))
    q.processAllAvailable()
    val afterB1 = spark.table("running_counts_test")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterB1 == Map(100L -> 2L, 200L -> 1L))

    input.addData(Ev(4, 100, 3000))
    q.processAllAvailable()
    // Update mode appends the new state row; latest per user wins.
    val latest = spark.table("running_counts_test")
      .collect().groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.map(_.getLong(1)).max }
    assert(latest == Map(100L -> 3L, 200L -> 1L))
    q.stop()
  }
}
