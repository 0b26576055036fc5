package graft.lm

import graft.functions.TextAlgos.mix64
import graft.lang.LangIdModel

/** Fused per-turn model scoring over a UNION hash table: the language
  * models and the perplexity model are merged into one open-addressing
  * table whose entries carry a value PER MODEL (the model's exact log
  * value for that key, or its own unseen-default baked in at build
  * time). The hot loop is then TWO probes per char (gram + context)
  * instead of two per model — ~5× fewer random accesses than probing
  * each model separately. Values live in a DENSE |union|×m array
  * addressed through a slot→rank indirection, so the broadcast size is
  * proportional to the key count, not the (3×-larger) hash capacity.
  *
  * Bit-exactness: entry values are copied unchanged from each NGramLM,
  * the per-char update is lp += (gram − ctx) exactly like
  * NGramLM.logProb, and the classification math is division-for-
  * division the LangIdModel softmax — so (lang, conf, ppl) equal the
  * unfused per-model path exactly (asserted in LangLmSpec).
  */
final class TurnScorer private (
    val langs: Array[String],
    nModels: Int, // langs + 1 (ppl model last)
    gramKeys: Array[Long], gramRank: Array[Int], gramVals: Array[Double], gramMask: Int,
    ctxKeys: Array[Long], ctxRank: Array[Int], ctxVals: Array[Double], ctxMask: Int,
    gramDefaults: Array[Double], ctxDefaults: Array[Double]
) extends Serializable {

  /** Returns (lang, confidence, perplexity); empty/null → ("und", 0, 1). */
  def score(norm: String): (String, Double, Double) = {
    if (norm == null || norm.isEmpty) return ("und", 0.0, 1.0)
    val m = nModels
    val lps = new Array[Double](m)
    val gbuf = new Array[Double](m) // per-char gram part; lp += gram - ctx
    var c1 = NGramLM.Boundary
    var c2 = NGramLM.Boundary
    var i = 0
    while (i < norm.length) {
      val c = NGramLM.norm(norm.charAt(i))
      val ctx = (c1.toLong << 16) | c2.toLong
      val gram = (ctx << 16) | c.toLong

      var slot = (mix64(gram) & gramMask).toInt
      var base = -1
      var searching = true
      while (searching) {
        val stored = gramKeys(slot)
        if (stored == gram + 1) { base = gramRank(slot) * m; searching = false }
        else if (stored == 0L) searching = false
        else slot = (slot + 1) & gramMask
      }
      var j = 0
      if (base >= 0) while (j < m) { gbuf(j) = gramVals(base + j); j += 1 }
      else while (j < m) { gbuf(j) = gramDefaults(j); j += 1 }

      slot = (mix64(ctx) & ctxMask).toInt
      base = -1
      searching = true
      while (searching) {
        val stored = ctxKeys(slot)
        if (stored == ctx + 1) { base = ctxRank(slot) * m; searching = false }
        else if (stored == 0L) searching = false
        else slot = (slot + 1) & ctxMask
      }
      // lp += (gram - ctx): same per-char rounding as NGramLM.logProb
      j = 0
      if (base >= 0) while (j < m) { lps(j) += gbuf(j) - ctxVals(base + j); j += 1 }
      else while (j < m) { lps(j) += gbuf(j) - ctxDefaults(j); j += 1 }

      c1 = c2
      c2 = c
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
    * (construction does a full union-table build; callers must NOT
    * rebuild per conversation/job).
    */
  lazy val default: TurnScorer =
    apply(graft.lang.LangId.default, graft.lang.LangId.pplModel)

  def apply(langId: LangIdModel, ppl: NGramLM): TurnScorer = {
    val models: Array[NGramLM] = langId.models :+ ppl
    val m = models.length

    def build(keysOf: NGramLM => Iterator[Long],
              valOf: (NGramLM, Long) => Double)
      : (Array[Long], Array[Int], Array[Double], Int) = {
      val union = models.iterator.flatMap(keysOf).toArray.distinct
      java.util.Arrays.sort(union) // deterministic layout + rank order
      var cap = 16
      while (cap < union.length * 3) cap <<= 1
      val keys = new Array[Long](cap)
      val rank = new Array[Int](cap)
      val vals = new Array[Double](union.length * m)
      val mask = cap - 1
      union.zipWithIndex.foreach { case (key, r) =>
        var i = (mix64(key) & mask).toInt
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = key + 1
        rank(i) = r
        var j = 0
        while (j < m) { vals(r * m + j) = valOf(models(j), key); j += 1 }
      }
      (keys, rank, vals, mask)
    }

    val (gk, gr, gv, gm) = build(_.gramKeySet, (mod, k) => mod.gramLog(k))
    val (ck, cr, cv, cm) = build(_.ctxKeySet, (mod, k) => mod.ctxLog(k))
    new TurnScorer(langId.langs, m, gk, gr, gv, gm, ck, cr, cv, cm,
      models.map(_.unseenNum), models.map(_.unseenDen))
  }
}
