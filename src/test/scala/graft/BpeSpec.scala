package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.lm.Bpe

/** BPE tokenizer: merge-training determinism (distributed == local),
  * greedy-encode semantics, and the concat roundtrip invariant the
  * DuckDB oracle leans on.
  */
class BpeSpec extends AnyFunSuite {

  private val corpus = Seq(
    "the quarterly report is ready for review",
    "the quarterly numbers look better than the last report",
    "please review the report before the meeting",
    "the meeting about the quarterly review is tomorrow",
    "numbers, numbers, and more numbers!",
    "reports are reviewed quarterly; reviews are reported")

  test("merge order is deterministic and fully reproducible by hand") {
    // corpus = 3x the word "abab": first merge (a,b) by count; then the
    // tie between (ab,ab) and (ab,</w>) resolves lexicographically
    // ('<' < 'a'), then the final pair merges the whole word
    val m = Bpe.trainLocal(Seq("abab abab", "abab"), numMerges = 10)
    assert(m.merges == IndexedSeq(
      ("a", "b"), ("ab", Bpe.EndOfWord), ("ab", "ab" + Bpe.EndOfWord)))
    assert(m.encodeWord("abab").toSeq == Seq("abab" + Bpe.EndOfWord))
    // an unseen word still encodes, down to code points + partial merges
    assert(m.encodeWord("abba").toSeq == Seq("ab", "b", "a", Bpe.EndOfWord))
  }

  test("distributed training == local training (identical merge tables)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.createDataset(corpus).repartition(5).toDF("text")
    val dist = Bpe.train(df, "text", numMerges = 64, maxVocabWords = 1 << 10)
    val local = Bpe.trainLocal(corpus, numMerges = 64, maxVocabWords = 1 << 10)
    assert(dist.merges == local.merges)
    assert(dist.merges.nonEmpty)
  }

  test("encode roundtrip: tokens concatenate back to word + end marker") {
    val m = Bpe.trainLocal(corpus, numMerges = 48)
    val words = corpus.flatMap(_.split("[\\s,;!]+")).filter(_.nonEmpty) ++
      Seq("unseenword", "zzz", "a", "Ü" + "ber", "😀ok") // incl. astral
    words.foreach { w =>
      val toks = m.encodeWord(w)
      assert(toks.mkString == w + Bpe.EndOfWord, s"roundtrip broke for '$w'")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("merges compress: trained token counts < code-point counts; countTokens == sum of encodeWord") {
    val m = Bpe.trainLocal(corpus, numMerges = 48)
    val cache = mutable.HashMap.empty[String, Int]
    val total = corpus.map(m.countTokens(_, cache)).sum
    val p = java.util.regex.Pattern.compile(Bpe.PreTokenRe)
    var words = 0L
    var cps = 0L
    corpus.foreach { line =>
      val mt = p.matcher(line)
      while (mt.find()) { words += 1; cps += mt.group().codePointCount(0, mt.group().length) }
    }
    // every word ends in its own marker symbol, so tokens >= words; with
    // merges trained on this corpus, tokens < raw code points + markers
    assert(total >= words)
    assert(total < cps + words, s"no compression: $total tokens vs $cps cps + $words markers")
    // per-word agreement between the cached counter and direct encode
    val direct = corpus.map { line =>
      val mt = p.matcher(line)
      var n = 0L
      while (mt.find()) n += m.encodeWord(mt.group()).length
      n
    }.sum
    assert(total == direct)
    // null/empty
    assert(m.countTokens(null, cache) == 0L)
    assert(m.countTokens("", cache) == 0L)
  }

  test("tokenCounts + wordTokenTable: distributed counts == local recount") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((99L, null.asInstanceOf[String]))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text").repartition(3)
    val m = Bpe.trainLocal(corpus, numMerges = 48)
    val got = Bpe.tokenCounts(df, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cache = mutable.HashMap.empty[String, Int]
    rows.foreach { case (id, t) =>
      assert(got(id) == m.countTokens(t, cache), s"doc $id")
    }
    // the oracle-seam table covers every distinct word and agrees with
    // direct encode
    val table = Bpe.wordTokenTable(df, "text", m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p = java.util.regex.Pattern.compile(Bpe.PreTokenRe)
    val distinctWords = corpus.flatMap { line =>
      val mt = p.matcher(line)
      val b = mutable.Buffer.empty[String]
      while (mt.find()) b += mt.group()
      b
    }.toSet
    assert(table.keySet == distinctWords)
    distinctWords.foreach(w => assert(table(w) == m.encodeWord(w).length.toLong))
  }

  test("vocabulary cap is a deterministic cut (capped model == model on the top slice)") {
    val linesA = Seq.fill(5)("alpha beta gamma delta") ++ Seq("epsilon zeta")
    val capped = Bpe.trainLocal(linesA, numMerges = 32, maxVocabWords = 4)
    // top-4 words by (count desc, word asc): alpha beta delta gamma
    val manual = Bpe.trainFromWordCounts(
      Seq("alpha" -> 5L, "beta" -> 5L, "delta" -> 5L, "gamma" -> 5L), 32)
    assert(capped.merges == manual.merges)
  }
}
