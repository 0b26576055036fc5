package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAlgos

/** Jaro-Winkler against published values (also cross-checked against
  * DuckDB's jaro_winkler_similarity by the driver's oracle gate on
  * jw1/j2) + hash/shingle/simhash invariants.
  */
class SimilaritySpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) < eps, s"$a vs $b")

  test("jaro-winkler canonical values") {
    approx(TextAlgos.jaroWinkler("MARTHA", "MARHTA"), 0.9611111111111111)
    approx(TextAlgos.jaroWinkler("DWAYNE", "DUANE"), 0.8400000000000001)
    approx(TextAlgos.jaroWinkler("FRENCE", "FRANCE"), 0.9111111111111112)
    // below the 0.7 boost threshold: prefix bonus must NOT apply
    approx(TextAlgos.jaroWinkler("abcdefgh", "abzzzzzz"), 0.5)
    approx(TextAlgos.jaroWinkler("same", "same"), 1.0)
    approx(TextAlgos.jaroWinkler("", ""), 1.0)
    approx(TextAlgos.jaroWinkler("a", ""), 0.0)
    approx(TextAlgos.jaroWinkler(null, "x"), 0.0)
  }

  test("jaro-winkler is symmetric and bounded") {
    val words = Seq("NATION_1", "NATION_12", "spark", "sprak", "a", "ab", "ba")
    for (a <- words; b <- words) {
      val s = TextAlgos.jaroWinkler(a, b)
      assert(s >= 0.0 && s <= 1.0)
      approx(s, TextAlgos.jaroWinkler(b, a))
      if (a == b) approx(s, 1.0)
    }
  }

  test("fingerprint is whitespace/case insensitive, content sensitive") {
    val a = TextAlgos.docFingerprint("The quick  Brown fox")
    assert(a == TextAlgos.docFingerprint("the quick brown FOX"))
    assert(a == TextAlgos.docFingerprint("  the   quick brown fox  "))
    assert(a != TextAlgos.docFingerprint("the quick brown cat"))
  }

  test("minhash signature approximates jaccard") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base.replace("today", "tonight")
    val far = "completely different words about spark window aggregation strategies"
    def sim(x: String, y: String): Double = {
      val sx = TextAlgos.minHashSignature(TextAlgos.shingles(x, 2), 128)
      val sy = TextAlgos.minHashSignature(TextAlgos.shingles(y, 2), 128)
      sx.zip(sy).count { case (p, q) => p == q }.toDouble / 128
    }
    val trueNear = TextAlgos.ngramJaccard(base, near, 2)
    assert(math.abs(sim(base, near) - trueNear) < 0.15)
    assert(sim(base, far) < 0.1)
    assert(sim(base, base) == 1.0)
  }

  test("simhash: near texts have small hamming distance, far texts large") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base.replace("today", "tonight")
    val far = "vector hash group order column part table stream batch big merge line"
    val hNear = TextAlgos.hamming64(TextAlgos.simHash(base), TextAlgos.simHash(near))
    val hFar = TextAlgos.hamming64(TextAlgos.simHash(base), TextAlgos.simHash(far))
    assert(hNear < hFar)
    assert(TextAlgos.hamming64(TextAlgos.simHash(base), TextAlgos.simHash(base)) == 0)
  }

  test("cosine basics") {
    approx(TextAlgos.cosine(Array(1f, 0f), Array(1f, 0f)), 1.0)
    approx(TextAlgos.cosine(Array(1f, 0f), Array(0f, 1f)), 0.0)
    approx(TextAlgos.cosine(Array(1f, 1f), Array(-1f, -1f)), -1.0)
    approx(TextAlgos.cosine(Array(0f, 0f), Array(1f, 1f)), 0.0)
  }
}
