package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lang.{LangId, SeedCorpus}
import graft.lm.NGramLM

/** Language-ID + perplexity model behavior and determinism. */
class LangLmSpec extends AnyFunSuite {

  test("langid classifies held-out-ish sentences correctly") {
    val cases = Seq(
      "we should check the data before making the final decision" -> "en",
      "nous devons verifier les donnees avant de prendre la decision" -> "fr",
      "wir sollten die daten pruefen bevor wir die entscheidung treffen" -> "de",
      "debemos revisar los datos antes de tomar la decision final" -> "es")
    cases.foreach { case (text, expect) =>
      val (lang, conf) = LangId.default.classify(text)
      assert(lang == expect, s"'$text' -> $lang (conf $conf)")
      assert(conf > 0.5)
    }
  }

  test("langid on empty/null is und") {
    assert(LangId.default.classify("") == (("und", 0.0)))
    assert(LangId.default.classify(null) == (("und", 0.0)))
  }

  test("perplexity separates prose, code, and gibberish") {
    val prose = LangId.pplModel.perplexity(
      "please make sure the tests pass before you merge the change")
    val code = LangId.pplModel.perplexity(
      """{"name": "search", "args": {"query": "window functions"}}""")
    val gibberish = LangId.pplModel.perplexity(
      "xqzwjv kfpqx mzzkrw qqvtxp zzfkwj pqxmzr")
    assert(prose < 15.0, s"prose ppl $prose")
    assert(code < 25.0, s"code ppl $code")
    assert(gibberish > 25.0, s"gibberish ppl $gibberish")
  }

  test("fused TurnScorer == unfused per-model scoring, bit-exact") {
    val scorer = graft.lm.TurnScorer(LangId.default, LangId.pplModel)
    val texts = SeedCorpus.en ++ SeedCorpus.fr ++ SeedCorpus.de ++
      SeedCorpus.es ++ SeedCorpus.code ++ Seq(
        "xqzwjv kfpqx mzzkrw", "a", "42", "mixed english y espanol juntos")
    texts.foreach { t =>
      val (l1, c1) = LangId.default.classify(t)
      val p1 = LangId.pplModel.perplexity(t)
      val (l2, c2, p2) = scorer.score(t)
      assert(l1 == l2, t)
      assert(c1 == c2, s"conf drift on '$t': $c1 vs $c2")
      assert(p1 == p2, s"ppl drift on '$t': $p1 vs $p2")
    }
    assert(scorer.score("") == (("und", 0.0, 1.0)))
    assert(scorer.score(null) == (("und", 0.0, 1.0)))
  }

  test("model scoring is deterministic and serialization-stable") {
    val m = LangId.default
    val texts = SeedCorpus.en.take(5) ++ SeedCorpus.fr.take(5)
    val before = texts.map(m.classify)

    // round-trip through java serialization (what Broadcast does)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(m)
    val m2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.lang.LangIdModel]
    assert(texts.map(m2.classify) == before)

    val lm = NGramLM.train(Seq("abc abc abd"), 0.1)
    assert(lm.perplexity("abc") == lm.perplexity("abc"))
  }

  test("trainDistributed == train exactly (same counts, same logs)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val lines = SeedCorpus.en ++ SeedCorpus.fr ++ SeedCorpus.code
    val local = NGramLM.train(lines)
    val dist = NGramLM.trainDistributed(
      spark.createDataset(lines).repartition(7))
    val probes = lines.take(20) ++ Seq("zzz unseen trigrams 123", "", "Ā mixed ÿ")
    probes.foreach { t =>
      assert(local.logProb(t) == dist.logProb(t), s"logProb diverges on: $t")
      assert(local.perplexity(t) == dist.perplexity(t))
    }
    assert(local.vocabSize == dist.vocabSize)
  }
}
