package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.scrub.Scrub

/** Property tests for the scrub chain (SURVEY.md §5): idempotence,
  * null-safety, column-vs-plain agreement. Raw scalacheck generators
  * with a fixed seed (no scalatestplus bridge offline).
  */
class ScrubPropertySpec extends AnyFunSuite {

  private val fragment = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.oneOf(" ", "  ", "\t", "\n", ", ", ". "),
    Gen.oneOf("alice@example.com", "bob.smith99@mail.org", "not@anemail",
      "+33612345678", "(415) 555-0123", "0607", "sk-abcdefghijklmnopqr",
      "AKIA" + "B" * 16, "deadbeef" * 5, "frakk", "FRAKK!", "smegheadish"),
    Gen.oneOf("é è ü ß ñ", "-", "?", "nan"))

  private val textGen: Gen[String] =
    Gen.listOf(fragment).map(_.mkString(" ")).map(_.take(500))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      textGen(Gen.Parameters.default, Seed(42L + i)))

  test("scrub is idempotent: scrub(scrub(x)) == scrub(x)") {
    samples(500).foreach { raw =>
      val norm = Scrub.normalizeWsPlain(raw)
      val (once, _) = Scrub.scrubPlain(norm)
      val (twice, counts2) = Scrub.scrubPlain(once)
      assert(twice == once, s"not idempotent on: $raw")
      assert(counts2.values.sum == 0, s"second pass found matches on: $once")
    }
  }

  test("normalization is idempotent") {
    samples(500).foreach { raw =>
      val once = Scrub.normalizeWsPlain(raw)
      assert(Scrub.normalizeWsPlain(once) == once)
    }
  }

  test("null safety") {
    assert(Scrub.normalizeWsPlain(null) == null)
    val (s, counts) = Scrub.scrubPlain(null)
    assert(s == null)
    assert(counts.values.sum == 0)
  }

  test("column scrub == plain scrub on arbitrary text") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = samples(300).toDF("raw")
    val (scrubbed, counts) = Scrub.scrubCol(Scrub.normalizeWsCol(col("raw")))
    val got = df.select(col("raw"), scrubbed.as("s"), counts.as("c"))
      .as[(String, String, Map[String, Int])].collect()
    got.foreach { case (raw, s, c) =>
      val (es, ec) = Scrub.scrubPlain(Scrub.normalizeWsPlain(raw))
      assert(s == es, s"text mismatch on: $raw")
      assert(c == ec, s"count mismatch on: $raw")
    }
  }
}
