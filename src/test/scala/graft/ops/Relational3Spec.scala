package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral pins for the third relational tranche (plan shapes in
  * PlanSpec, real-corpus values in the oracle rows).
  */
class Relational3Spec extends SparkSpec {

  test("q69 interpolation: exact blends, edge carry, same-bucket mean") {
    val sparkS = spark
    import sparkS.implicits._
    // step = 1 s; type m observes bucket 0 twice (mean!) and bucket 4;
    // type e observes only bucket 2 — its ends must carry the edge.
    val ev = Seq(
      (0L, "m", 10.0),
      (100000L, "m", 11.0), // same bucket as the first -> mean 10.5
      (4000000L, "m", 20.0),
      (2000000L, "e", 5.0))
      .toDF("us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Relational3.interpolateSeries(ev, step = 1000000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000000L) ->
        ((r.getDouble(2), r.getString(3))))
      .toMap
    // the spine is global (both types share the 0..4 s span)
    assert(out.size == 10, out.toString)
    assert(out(("m", 0L)) === ((10.5, "obs")))
    // linear blend between 10.5 @0s and 20.0 @4s
    assert(out(("m", 1L)) === ((10.5 + 9.5 * 0.25, "interp")))
    assert(out(("m", 2L)) === ((10.5 + 9.5 * 0.5, "interp")))
    assert(out(("m", 3L)) === ((10.5 + 9.5 * 0.75, "interp")))
    assert(out(("m", 4L)) === ((20.0, "obs")))
    // single-observation type: every other bucket is an edge carry
    assert(out(("e", 2L)) === ((5.0, "obs")))
    for (b <- Seq(0L, 1L, 3L, 4L))
      assert(out(("e", b)) === ((5.0, "edge")), s"e@$b: ${out(("e", b))}")
  }

  test("q71: bloom prefilter has no false negatives; the audit is exact") {
    val dir = "/root/testdata/sf0.001"
    val customer = graft.Tables.load(spark, dir, "customer")
    val orders = graft.Tables.load(spark, dir, "orders")
    val got = Relational3.bloomPrefilterJoin(customer, orders).collect()
    // Independent exact restatement WITHOUT any bloom: the per-priority
    // totals must be identical — the filter may only shed non-matches.
    val keys = customer.filter(col("c_acctbal") > 9000)
      .select(col("c_custkey")).distinct()
    val exact = orders
      .join(keys, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        D.dbl(sum(D.m(col("o_totalprice")))).as("rev"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.map(_.getString(0)).toSet === exact.keySet)
    got.foreach { r =>
      assert((r.getLong(1), r.getDouble(2)) === exact(r.getString(0)),
        s"priority ${r.getString(0)} diverged from the exact join")
    }
    // audit arithmetic: bloom passes = true matches + false positives
    val nExact = exact.values.map(_._1).sum
    val (nPass, nFp) = (got.head.getLong(3), got.head.getLong(4))
    assert(nPass === nExact + nFp, s"pass=$nPass exact=$nExact fp=$nFp")
    assert(nFp >= 0L)
  }

  test("q87: an engineered hourly spike ranks first; its hod siblings " +
      "carry the complementary z; a constant series never appears") {
    val sparkS = spark
    import sparkS.implicits._
    // 72 hours starting at epoch-hour 1,000,000. Type a: 5 events per
    // hour except hour index 30 bursts to 50; type b: constant 5.
    // Only the spiked hour-of-day class (hours 6, 30, 54) has nonzero
    // variance: samples {5, 5, 50} give mean 20, sigma = sqrt(450),
    // z = 30/21.2132... = 1.414214 for the spike and -0.707107 for the
    // two quiet siblings. Every other hod class is constant and must
    // be excluded by the integer zero-variance gate -- type b (all
    // constant) must not appear at all.
    val h0 = 1000000L
    val rows = (0 until 72).flatMap { i =>
      val perA = if (i == 30) 50 else 5
      (0 until perA).map(j => ("a", (h0 + i) * 3600 + j)) ++
        (0 until 5).map(j => ("b", (h0 + i) * 3600 + j))
    }
    val ev = rows.toDF("event_type", "sec")
      .select(col("event_type"), timestamp_seconds(col("sec")).as("ts"))
    val got = Relational3.seasonalAnomaly(ev).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val us = (i: Long) => (h0 + i) * 3600000000L
    assert(got.toSeq == Seq(
      (1, "a", us(30), 50L, 20.0, 1.414214),
      (2, "a", us(6), 5L, 20.0, -0.707107),
      (3, "a", us(54), 5L, 20.0, -0.707107)), got.toSeq)
  }

  test("q87: pre-1970 timestamps bucket by FLOOR — an event inside a " +
      "negative epoch hour stays in that hour, never rounds up") {
    val sparkS = spark
    import sparkS.implicits._
    // The spike corpus anchored at a NEGATIVE epoch hour: every event
    // sits j in [0, 50) seconds INSIDE its hour, so truncate-toward-
    // zero division (sign-of-dividend) would push each non-aligned
    // pre-1970 event one hour UP and scramble the counts; floor keeps
    // the engineered structure intact and the exact z's identical to
    // the positive-epoch case.
    val h0 = -1000L
    val rows = (0 until 72).flatMap { i =>
      val perA = if (i == 30) 50 else 5
      (0 until perA).map(j => ("a", (h0 + i) * 3600 + j)) ++
        (0 until 5).map(j => ("b", (h0 + i) * 3600 + j))
    }
    val ev = rows.toDF("event_type", "sec")
      .select(col("event_type"), timestamp_seconds(col("sec")).as("ts"))
    val got = Relational3.seasonalAnomaly(ev).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getDouble(5)))
    val us = (i: Long) => (h0 + i) * 3600000000L
    assert(got.toSeq == Seq(
      (1, us(30), 50L, 1.414214),
      (2, us(6), 5L, -0.707107),
      (3, us(54), 5L, -0.707107)), got.toSeq)
  }
}
