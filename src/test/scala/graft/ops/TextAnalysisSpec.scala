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
}
