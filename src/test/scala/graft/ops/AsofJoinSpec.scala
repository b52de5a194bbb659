package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Unit semantics of the generic union+window as-of join. */
class AsofJoinSpec extends SparkSpec {

  test("as-of picks the latest right row at-or-before each left row") {
    val sparkS = spark
    import sparkS.implicits._
    val trades = Seq((1L, 100L, 9L), (1L, 205L, 10L), (2L, 50L, 11L))
      .toDF("acct", "t", "trade_id")
    val quotes = Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0),
      (2L, 80L, 9.9))
      .toDF("acct", "qt", "px")

    val out = Relational2.asofJoin(trades, quotes,
      key = "acct", leftTime = "t", rightTime = "qt", valueCol = "px")
      .collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap

    assert(out(9L) == Some(1.0)) // simultaneous quote IS visible
    assert(out(10L) == Some(2.0)) // latest at-or-before 205
    assert(out(11L) == None) // no quote yet for acct 2 at t=50
  }

  test("native as-of join matches the composed form on the same cases") {
    val sparkS = spark
    import sparkS.implicits._
    val trades = Seq((1L, 100L, 9L), (1L, 205L, 10L), (2L, 50L, 11L),
      (3L, 500L, 12L)) // key with NO right rows at all
      .toDF("acct", "t", "trade_id")
    val quotes = Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0),
      (2L, 80L, 9.9))
      .toDF("q_acct", "qt", "px")

    val out = Joins.asofJoinNative(trades, quotes,
      leftKey = "acct", rightKey = "q_acct",
      leftTime = "t", rightTime = "qt")
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double]))
      .toMap

    assert(out(9L) == Some(1.0)) // inclusive at equal timestamps
    assert(out(10L) == Some(2.0)) // latest at-or-before, not just any
    assert(out(11L) == None) // right rows exist but all later
    assert(out(12L) == None) // key absent from the right side
  }

  test("native as-of groups null keys like the window form groups them") {
    val sparkS = spark
    import sparkS.implicits._
    // Null keys cluster together under both partitionBy (composed)
    // and the merge's natural ordering — a null-key left row sees
    // null-key right rows, not nothing.
    val trades = Seq((Option.empty[Long], 100L, 1L), (Some(7L), 100L, 2L))
      .toDF("acct", "t", "trade_id")
    val quotes = Seq((Option.empty[Long], 50L, 5.0), (Some(7L), 60L, 7.0))
      .toDF("q_acct", "qt", "px")
    val out = Joins.asofJoinNative(trades, quotes, "acct", "q_acct", "t", "qt")
      .collect()
      .map(r => r.getAs[Long]("trade_id") -> r.getAs[Double]("px"))
      .toMap
    assert(out(1L) == 5.0)
    assert(out(2L) == 7.0)
  }

  test("property: native as-of ≡ composed union+window on random collision-heavy data") {
    val sparkS = spark
    import sparkS.implicits._
    // Tiny key/time domains force every edge at once: repeated keys,
    // exact time ties (left==right and right==right), keys missing
    // from either side, empty sides. Right "value" is a function of
    // (key, time) so tie-breaking among identical sort positions is
    // value-invariant — both implementations are deterministic.
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 12).foreach { i =>
      val seed = Seed(i.toLong * 7919)
      val lRows = rowGen(params, seed).get
      val rRows = rowGen(params, seed.next).get.distinct
      val trades = lRows.zipWithIndex
        .map { case ((k, t), id) => (k, t, id.toLong) }
        .toDF("acct", "t", "trade_id")
      // The composed helper keys on a SHARED column name, so the right
      // side reuses "acct"; the native path handles either naming.
      val quotes = rRows
        .map { case (k, t) => (k, t, (k * 1000 + t).toDouble) }
        .toDF("acct", "qt", "px")

      val native = Joins.asofJoinNative(trades, quotes,
          "acct", "acct", "t", "qt")
        .select("trade_id", "px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val composed = Relational2.asofJoin(trades, quotes,
          key = "acct", leftTime = "t", rightTime = "qt", valueCol = "px")
        .select("trade_id", "asof_px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(native == composed, s"seed $i: $native vs $composed")
    }
  }

  test("native as-of rejects mismatched key/time types at construction") {
    val sparkS = spark
    import sparkS.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1, 5L, 1.0)).toDF("rk", "rt", "v") // rk is INT, k is BIGINT
    val ex = intercept[IllegalArgumentException] {
      Joins.asofJoinNative(l, r, "k", "rk", "t", "rt")
    }
    assert(ex.getMessage.contains("key types differ"))
  }

  test("native as-of plans a merge, not a union+window") {
    val sparkS = spark
    import sparkS.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val p = Joins.asofJoinNative(l, r, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(p.contains("GraftAsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Union"), p)
  }
}
