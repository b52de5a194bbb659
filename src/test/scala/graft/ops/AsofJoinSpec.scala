package graft.ops

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
}
