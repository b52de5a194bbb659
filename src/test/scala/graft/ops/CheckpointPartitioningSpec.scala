package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftCheckpoints

import graft.SparkSpec

/** Pins the physical property the r20 graph-tier optimization stands
  * on: [[org.apache.spark.sql.GraftCheckpoints.localCheckpointKeyed]]
  * materializes a frame hash-partitioned by a key and the returned
  * plan REMEMBERS that partitioning, so every later same-key
  * aggregation/join requirement is satisfied WITHOUT a fresh
  * Exchange — guide §2.4's "two operations keyed the same way share
  * one exchange", carried across a lineage cut.
  *
  * The shim exists because plain `localCheckpoint()` under AQE yields
  * `UnknownPartitioning` (verified on Spark 4.1.2 — the first test
  * documents exactly that), which silently re-grew one node-sized
  * exchange per graph round. If a Spark upgrade changes either
  * behavior, these tests say so loudly.
  */
class CheckpointPartitioningSpec extends SparkSpec {

  test("plain localCheckpoint under AQE FORGETS partitioning (the " +
    "defect the shim works around) — same-key groupBy re-exchanges") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 97L, i.toLong)).toDF("k", "v")
      .repartition(col("k"))
      .localCheckpoint()
    val agg = df.groupBy("k").agg(sum("v").as("s"))
    agg.write.format("noop").mode("overwrite").save()
    val p = agg.queryExecution.executedPlan.toString
    // If this starts PASSING without the shim, Spark fixed the
    // underlying loss and localCheckpointKeyed can be retired.
    assert(p.contains("Exchange"),
      s"plain localCheckpoint now preserves partitioning?\n$p")
  }

  test("localCheckpointKeyed: same-key groupBy plans NO new Exchange " +
    "and aggregates to the same result") {
    import spark.implicits._
    val raw = (1 to 1000).map(i => (i % 97L, i.toLong)).toDF("k", "v")
    val df = GraftCheckpoints.localCheckpointKeyed(raw, "k", 4)
    val agg = df.groupBy("k").agg(sum("v").as("s"))
    agg.write.format("noop").mode("overwrite").save()
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"groupBy on the declared partitioning key re-exchanged:\n$p")
    // And the declaration is TRUE: the aggregate equals the plain one.
    val got = agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = raw.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => fail("expected LogicalRDD root")
    }
  }

  test("localCheckpointKeyed(sorted): merge join re-exchanges and " +
    "re-sorts only the non-checkpointed side") {
    import spark.implicits._
    val raw = (1 to 1000).map(i => (i % 97L, i.toLong)).toDF("k", "v")
    val big = GraftCheckpoints.localCheckpointKeyed(raw, "k", 4,
      sorted = true)
    val small = (1 to 97).map(i => (i.toLong, s"x$i")).toDF("k", "name")
    val j = big.hint("merge").join(small.hint("merge"), "k")
      .groupBy("k").agg(count(lit(1)).as("n"))
    j.write.format("noop").mode("overwrite").save()
    val p = j.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected exactly 1 exchange (the small side's), got $exchanges:\n$p")
    // The checkpointed side must not be re-sorted: the only Sort
    // operators sit above the small side's exchange.
    val sortCount = "Sort \\[".r.findAllIn(p).size
    assert(sortCount == 1,
      s"expected exactly 1 sort (the small side's), got $sortCount:\n$p")
    big.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => fail("expected LogicalRDD root")
    }
  }
}
