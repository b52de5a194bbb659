package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the winnowing construction itself (pure compute(), no
  * Spark needed; deterministic via fixed ScalaCheck seeds). The
  * load-bearing one is the SIGMOD'03 guarantee that makes winnowing
  * usable for near-dup detection: any match of length >= w + k - 1 is
  * caught by at least one shared fingerprint.
  */
class WinnowSpec extends AnyFunSuite {

  private val k = 5
  private val w = 8

  private def fp(s: String): Set[Long] =
    WinnowFingerprints.compute(s.getBytes("UTF-8"), k, w).toSet

  private val asciiText: Gen[String] =
    Gen.chooseNum(30, 200).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') :+ ' ')))

  private def sample(seed: Long): String =
    asciiText.pureApply(Gen.Parameters.default, Seed(seed))

  test("winnowing guarantee: a shared substring of length w+k-1 yields a shared fingerprint") {
    for (i <- 0 until 100) {
      val a = sample(1000L + i)
      val b = sample(2000L + i)
      // Plant a common run of exactly w+k-1 bytes into two otherwise
      // unrelated documents.
      val common = (sample(3000L + i) * 3).take(w + k - 1)
      val d1 = a + common + a.reverse
      val d2 = b + common + b.reverse
      assert(fp(d1).intersect(fp(d2)).nonEmpty,
        s"no shared fingerprint for planted common run; d1=$d1 d2=$d2")
    }
  }

  test("output is sorted, distinct, and position-robust") {
    for (i <- 0 until 100) {
      val a = sample(4000L + i)
      val out = WinnowFingerprints.compute(a.getBytes("UTF-8"), k, w)
      assert(out.toSeq == out.toSeq.sorted)
      assert(out.toSeq.distinct == out.toSeq)
      // Shifting a document inside a larger container keeps shared
      // fingerprints (they depend on content, not absolute offsets).
      assert(fp("zzzzzzzzzz" + a).intersect(fp(a)).nonEmpty)
    }
  }

  test("documented edge rules: empty and shorter-than-k documents") {
    // empty doc: one gram of g = 0
    val empty = WinnowFingerprints.compute(Array.emptyByteArray, k, w)
    assert(empty.toSeq ==
      Seq(WinnowFingerprints.B % WinnowFingerprints.P))
    // short doc (< k bytes): one gram over the available bytes
    val short = WinnowFingerprints.compute("ab".getBytes("UTF-8"), k, w)
    val g = ('a'.toLong << 8) | 'b'.toLong
    assert(short.toSeq ==
      Seq(((g % WinnowFingerprints.P) * WinnowFingerprints.A +
        WinnowFingerprints.B) % WinnowFingerprints.P))
  }
}
