package graft.lm

import scala.collection.mutable

/** Char-trigram language model with add-k smoothing, stored as sorted
  * parallel long/int arrays (compact, serializable, broadcast-friendly,
  * binary-search lookup — no per-row boxing).
  *
  * This is the KenLM-style scorer of the north_star: per-row perplexity
  * given a broadcast model. It is also the building block of the
  * fastText-style language-ID (one LM per language, argmax avg log-prob)
  * in [[graft.lang.LangId]]. Deterministic: fixed operation order, no
  * floats whose value depends on partition iteration order
  * (SURVEY.md §7.5 #3).
  *
  * Text normalization: lowercase, digits → '0', whitespace → ' ',
  * chars above U+00FF → 'Ā' bucket (keeps the table small while
  * making non-Latin scripts score as out-of-distribution).
  */
final class NGramLM private (
    gramKeys: Array[Long],
    gramCounts: Array[Int],
    ctxKeys: Array[Long],
    ctxCounts: Array[Int],
    val vocabSize: Int,
    val k: Double
) extends Serializable {

  import NGramLM._

  private def lookup(keys: Array[Long], vals: Array[Int], key: Long): Int = {
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i >= 0) vals(i) else 0
  }

  /** Sum of log P(c | prev2) over the normalized text; 0 chars → 0.0. */
  def logProb(text: String): (Double, Int) = {
    if (text == null || text.isEmpty) return (0.0, 0)
    var c1 = Boundary
    var c2 = Boundary
    var lp = 0.0
    var n = 0
    var i = 0
    while (i < text.length) {
      val c = norm(text.charAt(i))
      val ctx = (c1.toLong << 16) | c2.toLong
      val gram = (ctx << 16) | c.toLong
      val num = lookup(gramKeys, gramCounts, gram) + k
      val den = lookup(ctxKeys, ctxCounts, ctx) + k * vocabSize
      lp += StrictMath.log(num / den)
      n += 1
      c1 = c2
      c2 = c
      i += 1
    }
    (lp, n)
  }

  def avgLogProb(text: String): Double = {
    val (lp, n) = logProb(text)
    if (n == 0) 0.0 else lp / n
  }

  /** Char-level perplexity: exp(-avg log-prob). Empty text → 1.0. */
  def perplexity(text: String): Double = {
    val (lp, n) = logProb(text)
    if (n == 0) 1.0 else StrictMath.exp(-lp / n)
  }
}

object NGramLM {
  /** Sentinel context char for positions before the text start. */
  final val Boundary: Char = ''

  def norm(c0: Char): Char = {
    val c = Character.toLowerCase(c0)
    if (Character.isDigit(c)) '0'
    else if (Character.isWhitespace(c)) ' '
    else if (c > 'ÿ' && c != Boundary) 'Ā'
    else c
  }

  /** Train from corpus lines; k = add-k smoothing constant. */
  def train(lines: Seq[String], k: Double = 0.1): NGramLM = {
    val grams = new mutable.LongMap[Int]()
    val ctxs = new mutable.LongMap[Int]()
    val vocab = new mutable.HashSet[Char]()
    lines.foreach { line =>
      var c1 = Boundary
      var c2 = Boundary
      var i = 0
      while (i < line.length) {
        val c = norm(line.charAt(i))
        vocab += c
        val ctx = (c1.toLong << 16) | c2.toLong
        val gram = (ctx << 16) | c.toLong
        grams.update(gram, grams.getOrElse(gram, 0) + 1)
        ctxs.update(ctx, ctxs.getOrElse(ctx, 0) + 1)
        c1 = c2
        c2 = c
        i += 1
      }
    }
    def toSorted(m: mutable.LongMap[Int]): (Array[Long], Array[Int]) = {
      val ks = m.keys.toArray
      java.util.Arrays.sort(ks)
      (ks, ks.map(m(_)))
    }
    val (gk, gv) = toSorted(grams)
    val (ck, cv) = toSorted(ctxs)
    // +1 for unseen chars (everything normalizes into a small alphabet)
    new NGramLM(gk, gv, ck, cv, math.max(vocab.size + 1, 2), k)
  }
}
