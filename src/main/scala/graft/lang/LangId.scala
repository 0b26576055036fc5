package graft.lang

import graft.lm.NGramLM

/** fastText-style language identifier: one char-trigram LM per language
  * (hash-free, profile-based — the same "sampled classify → majority
  * vote" pattern as the reference's semantic type detection,
  * DataGuardianApp/utils.py:999-1106, recast per turn + per
  * conversation). Broadcast once, scored per row inside a single
  * mapPartitions pass together with perplexity.
  *
  * Deterministic: pure FP with fixed per-language iteration order.
  */
final class LangIdModel(val langs: Array[String], val models: Array[NGramLM])
    extends Serializable {

  /** Returns (lang, confidence). Confidence is the softmax posterior of
    * the winning language over per-char avg log-probs scaled by the
    * effective evidence length (capped so that very long texts don't
    * saturate to exactly 1.0 in a way that hides ties).
    */
  def classify(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val scores = new Array[Double](langs.length)
    var nChars = 0
    var i = 0
    while (i < langs.length) {
      val (lp, n) = models(i).logProb(text)
      scores(i) = if (n == 0) -1e9 else lp / n
      nChars = n
      i += 1
    }
    if (nChars == 0) return ("und", 0.0)
    val evidence = math.min(nChars, 64).toDouble
    var best = 0
    i = 1
    while (i < langs.length) { if (scores(i) > scores(best)) best = i; i += 1 }
    // softmax over evidence-scaled scores, numerically stabilized
    var denom = 0.0
    i = 0
    while (i < langs.length) {
      denom += StrictMath.exp((scores(i) - scores(best)) * evidence)
      i += 1
    }
    (langs(best), 1.0 / denom)
  }
}

object LangId {
  /** Default model over the embedded seed corpora. Built lazily once per
    * JVM (driver builds it, broadcast ships it; executors deserialize).
    */
  lazy val default: LangIdModel = {
    val langs = SeedCorpus.byLang.keys.toArray.sorted
    new LangIdModel(langs, langs.map(l => NGramLM.train(SeedCorpus.byLang(l))))
  }

  /** Perplexity LM: allowed natural languages + code-ish tool payloads,
    * so in-distribution transcript text (including tool turns) scores
    * low and gibberish scores high.
    */
  lazy val pplModel: NGramLM = NGramLM.train(
    SeedCorpus.en ++ SeedCorpus.fr ++ SeedCorpus.de ++ SeedCorpus.code
  )
}
