package graft.lm

import graft.lang.LangIdModel

/** Fused per-turn model scoring: ONE pass over the normalized text
  * computes the (gram, ctx) keys once per char and probes every
  * language model plus the perplexity model — instead of five separate
  * string walks. Per-model accumulation order is identical to
  * NGramLM.logProb, so lang/conf/ppl are bit-equal to the unfused path
  * (asserted in LangLmSpec).
  */
final class TurnScorer(
    val langs: Array[String],
    langModels: Array[NGramLM],
    pplModel: NGramLM
) extends Serializable {

  /** Returns (lang, confidence, perplexity); empty/null → ("und", 0, 1). */
  def score(norm: String): (String, Double, Double) = {
    if (norm == null || norm.isEmpty) return ("und", 0.0, 1.0)
    val k = langModels.length
    val lps = new Array[Double](k)
    var pplLp = 0.0
    var c1 = NGramLM.Boundary
    var c2 = NGramLM.Boundary
    var i = 0
    while (i < norm.length) {
      val c = NGramLM.norm(norm.charAt(i))
      val ctx = (c1.toLong << 16) | c2.toLong
      val gram = (ctx << 16) | c.toLong
      var m = 0
      while (m < k) { lps(m) += langModels(m).lpFor(gram, ctx); m += 1 }
      pplLp += pplModel.lpFor(gram, ctx)
      c1 = c2
      c2 = c
      i += 1
    }
    val n = norm.length
    // identical classification math to LangIdModel.classify
    var best = 0
    var m = 1
    while (m < k) { if (lps(m) / n > lps(best) / n) best = m; m += 1 }
    val evidence = math.min(n, 64).toDouble
    var denom = 0.0
    m = 0
    while (m < k) {
      denom += StrictMath.exp((lps(m) / n - lps(best) / n) * evidence)
      m += 1
    }
    (langs(best), 1.0 / denom, StrictMath.exp(-pplLp / n))
  }
}

object TurnScorer {
  def apply(langId: LangIdModel, ppl: NGramLM): TurnScorer =
    new TurnScorer(langId.langs, langId.models, ppl)
}
