package graft.lm

import graft.lang.LangIdModel

/** Fused per-turn model scoring over DENSE direct-indexed tables: the
  * language models and the perplexity model are merged into per-model
  * value rows addressed by compact alphabet ids instead of hashed
  * probes. The trained alphabet (distinct normalized chars across every
  * model's gram/ctx keys, plus the boundary sentinel) is small — a few
  * dozen symbols from the embedded seed corpora — so the full
  * (A+1)³×m gram table and (A+1)²×m ctx table fit in a few MB and the
  * hot loop is THREE array reads per (char, model): no hashing, no
  * probe chains, no branches. Id A (the last one) is the
  * out-of-alphabet bucket; every index touching it holds the model's
  * unseen default, exactly what a hash miss returned.
  *
  * Bit-exactness: every table entry is filled by probing the source
  * NGramLM for the packed char key (exact stored log value, or the
  * model's own unseen-default), the per-char update is
  * lp += (gram − ctx) exactly like NGramLM.logProb, and the
  * classification math is division-for-division the LangIdModel softmax
  * — so (lang, conf, ppl) equal the unfused per-model path exactly
  * (asserted in LangLmSpec).
  */
final class TurnScorer private (
    val langs: Array[String],
    nModels: Int, // langs + 1 (ppl model last)
    a1: Int, // alphabet size incl. the trailing unseen id
    charId: Array[Short], // raw char -> norm -> alphabet id (65536 entries)
    gramVals: Array[Double], // a1³ × m, defaults baked in
    ctxVals: Array[Double], // a1² × m, defaults baked in
    boundaryId: Int
) extends Serializable {

  /** Returns (lang, confidence, perplexity); empty/null → ("und", 0, 1). */
  def score(norm: String): (String, Double, Double) = {
    if (norm == null || norm.isEmpty) return ("und", 0.0, 1.0)
    val m = nModels
    val a = a1
    val lps = new Array[Double](m)
    var c1 = boundaryId
    var c2 = boundaryId
    var i = 0
    while (i < norm.length) {
      val cid = charId(norm.charAt(i))
      val ctxPart = c1 * a + c2
      val ctxBase = ctxPart * m
      val gramBase = (ctxPart * a + cid) * m
      // lp += (gram - ctx): same per-char rounding as NGramLM.logProb
      var j = 0
      while (j < m) { lps(j) += gramVals(gramBase + j) - ctxVals(ctxBase + j); j += 1 }
      c1 = c2
      c2 = cid
      i += 1
    }
    val n = norm.length
    val k = langs.length
    var best = 0
    var t = 1
    while (t < k) { if (lps(t) / n > lps(best) / n) best = t; t += 1 }
    val evidence = math.min(n, 64).toDouble
    var denom = 0.0
    t = 0
    while (t < k) {
      denom += StrictMath.exp((lps(t) / n - lps(best) / n) * evidence)
      t += 1
    }
    (langs(best), 1.0 / denom, StrictMath.exp(-lps(k) / n))
  }
}

object TurnScorer {

  /** The default scorer over the embedded models — built once per JVM
    * (construction fills the dense union tables; callers must NOT
    * rebuild per conversation/job).
    */
  lazy val default: TurnScorer =
    apply(graft.lang.LangId.default, graft.lang.LangId.pplModel)

  def apply(langId: LangIdModel, ppl: NGramLM): TurnScorer = {
    val models: Array[NGramLM] = langId.models :+ ppl
    val m = models.length

    // trained alphabet: every char position of every model's gram/ctx
    // keys, plus the boundary sentinel. Sorted → deterministic ids.
    val chars = scala.collection.mutable.SortedSet[Char](NGramLM.Boundary)
    def addKeyChars(key: Long, n: Int): Unit = {
      var sh = 0
      var i = 0
      while (i < n) { chars += ((key >>> sh) & 0xffffL).toChar; sh += 16; i += 1 }
    }
    models.foreach { mod =>
      mod.gramKeySet.foreach(addKeyChars(_, 3))
      mod.ctxKeySet.foreach(addKeyChars(_, 2))
    }
    val alphabet = chars.toArray
    val a = alphabet.length // ids 0..a-1 = trained chars, id a = unseen
    val a1 = a + 1
    // dense tables stay a few MB only because the normalized alphabet
    // is small; hard guard in case NGramLM.norm is ever widened
    require(a1 <= 128,
      s"trained alphabet has $a symbols — the dense TurnScorer tables " +
        "would outgrow cache; shrink NGramLM.norm or rework the layout")

    // norm's range is ≤ U+0100 ('Ā' bucket) by construction, so a small
    // direct array maps normalized char → id; the 65536-entry charId
    // table then folds norm + id into one lookup per raw char
    require(alphabet.forall(_.toInt <= 0x101), "normalized char outside norm's range")
    val idOfNorm = Array.fill[Short](0x102)(a.toShort)
    alphabet.zipWithIndex.foreach { case (ch, i) => idOfNorm(ch.toInt) = i.toShort }
    val charId = new Array[Short](1 << 16)
    var c = 0
    while (c < (1 << 16)) {
      val nc = NGramLM.norm(c.toChar).toInt
      charId(c) = if (nc < 0x102) idOfNorm(nc) else a.toShort
      c += 1
    }

    @inline def charAt(id: Int): Long =
      if (id < a) alphabet(id).toLong else 0xfffeL // impossible char: never a key

    val ctxVals = new Array[Double](a1 * a1 * m)
    var i1 = 0
    while (i1 < a1) {
      var i2 = 0
      while (i2 < a1) {
        val key = (charAt(i1) << 16) | charAt(i2)
        val base = (i1 * a1 + i2) * m
        var j = 0
        while (j < m) { ctxVals(base + j) = models(j).ctxLog(key); j += 1 }
        i2 += 1
      }
      i1 += 1
    }

    val gramVals = new Array[Double](a1 * a1 * a1 * m)
    i1 = 0
    while (i1 < a1) {
      var i2 = 0
      while (i2 < a1) {
        val ctxKey = (charAt(i1) << 16) | charAt(i2)
        var i3 = 0
        while (i3 < a1) {
          val key = (ctxKey << 16) | charAt(i3)
          val base = ((i1 * a1 + i2) * a1 + i3) * m
          var j = 0
          while (j < m) { gramVals(base + j) = models(j).gramLog(key); j += 1 }
          i3 += 1
        }
        i2 += 1
      }
      i1 += 1
    }

    val boundaryId = idOfNorm(NGramLM.Boundary.toInt).toInt
    new TurnScorer(langId.langs, m, a1, charId, gramVals, ctxVals, boundaryId)
  }
}
