package graft.ops

import graft.SparkSpec

/** Known-answer tests for the text-analysis operators whose semantics
  * aren't self-evident from the oracle SQL (the oracle pins
  * determinism; these pin the math).
  */
class TextAnalysisSpec extends SparkSpec {

  test("tfidf: rare terms outrank common ones, tf scales the score") {
    val sparkS = spark
    import sparkS.implicits._
    // N=3; df: apple 2, banana 2, cherry 2, date 1.
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry apple date"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTop(df, k = 4).collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> (r.getString(1), r.getDouble(4)))
      .toMap
    // doc 1: apple tf=2 → 2·ln(3/2) ≈ 0.81 beats banana ln(3/2) ≈ 0.41
    assert(top((1L, 1))._1 == "apple")
    assert(math.abs(top((1L, 1))._2 - 2 * math.log(1.5)) < 1e-5)
    // doc 3: date (df=1) → ln(3) ≈ 1.10 outranks both df=2 terms
    assert(top((3L, 1))._1 == "date")
    assert(math.abs(top((3L, 1))._2 - math.log(3.0)) < 1e-5)
    // doc 2: banana/cherry tie on score → term order breaks the tie
    assert(top((2L, 1))._1 == "banana" && top((2L, 2))._1 == "cherry")
  }

  test("tfidf: corpus-wide terms score zero") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq((1L, "same text"), (2L, "same words"))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.tfidfTop(df, k = 3).collect()
      .map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(scores("same") == 0.0) // df = N → ln(1) = 0
    assert(scores("text") > 0.0 && scores("words") > 0.0)
  }

  test("applyMerge is greedy left-to-right, incl. overlapping runs") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.col
    def merged(syms: Seq[String], x: String, y: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("syms")
        .select(TextAnalysis.applyMerge(col("syms"), x, y).as("m"))
        .head().getSeq[String](0)
    // disjoint matches all merge at once
    assert(merged(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // x=y: runs pair up greedily — k consecutive → ⌊k/2⌋ merges
    assert(merged(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(merged(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(merged(Seq("b", "a", "a", "a", "a", "a", "b"), "a", "a") ==
      Seq("b", "aa", "aa", "a", "b"))
    // no match → unchanged; match against merged symbol doesn't fire
    assert(merged(Seq("aa", "a"), "a", "a") == Seq("aa", "a"))
    assert(merged(Seq("x"), "a", "b") == Seq("x"))
  }

  test("bpe induction: first round equals t11's top pair; vocab shrinks") {
    val sparkS = spark
    import sparkS.implicits._
    // 'aaab' x3, 'abab' x2 → round-1 pairs: (a,a) 3·2=6? no — run
    // parity: 'aaab' contributes (a,a)x2,(a,b)x1 per occurrence →
    // (a,a)=6, (a,b)=3+4=7... enumerate: aaab: aa,aa,ab; abab:
    // ab,ba,ab. So ab: 3·1+2·2=7, aa: 3·2=6, ba: 2. Top = (a,b).
    val df = Seq((1L, "aaab aaab abab"), (2L, "aaab abab"))
      .toDF("doc_id", "text")
    val steps = TextAnalysis.bpeInduce(df, merges = 2).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(steps(1) == ("a", "b", 7L), s"got ${steps(1)}")
    // after merging (a,b): aaab→[a,a,ab], abab→[ab,ab] →
    // round-2 pairs: (a,a)=3, (a,ab)=3, (ab,ab)=2 → tie on n=3,
    // lex tie-break picks lhs 'a', rhs 'a' < 'ab'.
    assert(steps(2) == ("a", "a", 3L), s"got ${steps(2)}")
  }
}
