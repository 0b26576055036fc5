package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.TextAlgos.mix64
import graft.lang.SeedCorpus
import graft.schema.Turn

/** Deterministic synthetic transcript corpus (FIXTURES.md §1/§2/§5).
  *
  * Every turn is a pure function of (seed, convIdx): the distributed
  * generator (`spark.range(n).flatMap`) and the local generator used by
  * the golden oracle produce byte-identical rows in any partitioning.
  * No wall-clock, no java.util.Random (we use splitmix64 streams).
  *
  * Anomaly classes are the reference's dirty CLIENTS fixture
  * (db_configs/test_data.sql) transplanted into transcript payloads —
  * see FIXTURES.md §2 for the mapping.
  */
object TranscriptGen {

  final class Rng(seed: Long) {
    private var state: Long = mix64(seed)
    def nextLong(): Long = { state = mix64(state); state }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  // Per-language unigram pools derived from the seed corpora (distinct,
  // sorted → deterministic). Generated text therefore comes from the
  // same distribution the language-ID profiles are trained on.
  private def wordsOf(lines: Seq[String]): IndexedSeq[String] =
    lines.flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct.sorted.toIndexedSeq

  private val wordPool: Map[String, IndexedSeq[String]] =
    SeedCorpus.byLang.map { case (l, lines) => l -> wordsOf(lines) }

  private val langWeights: IndexedSeq[(String, Double)] =
    IndexedSeq("en" -> 0.45, "fr" -> 0.22, "de" -> 0.15, "es" -> 0.10, "zz" -> 0.08)

  private val Sentinels = IndexedSeq("MISSINGVALUE", "NULL", "-", "=", "!", "?", "nan", "")
  private val BadRoles = IndexedSeq("operator", "bot", "USER", "Assistant", "client")
  private val Tools = IndexedSeq("search", "read_file", "execute_sql", "browser", "calculator")
  private val Slurs = IndexedSeq("frakk", "smeghead", "gorram", "felgercarb")

  private val BaseEpochMs = 1700000000000L // fixed, not wall-clock

  private def pickLang(r: Rng): String = {
    val u = r.nextDouble()
    var acc = 0.0
    langWeights.foreach { case (l, w) =>
      acc += w
      if (u < acc) return l
    }
    langWeights.last._1
  }

  private def sentence(r: Rng, lang: String, nWords: Int): String = {
    if (lang == "zz") return gibberish(r, 30 + r.nextInt(120))
    val pool = wordPool(lang)
    (0 until nWords).map(_ => r.pick(pool)).mkString(" ")
  }

  private def gibberish(r: Rng, len: Int): String = {
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) {
      val u = r.nextInt(40)
      val c =
        if (u < 26) ('a' + r.nextInt(26)).toChar
        else if (u < 30) ('q' + r.nextInt(8)).toChar // consonant-heavy
        else if (u < 33) ' '
        else ('a' + r.nextInt(26)).toChar
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def email(r: Rng): String = {
    val names = IndexedSeq("alice", "bob.smith", "carol_j", "dave99", "eve.adams")
    val doms = IndexedSeq("example.com", "mail.org", "test.net", "corp.io")
    s"${r.pick(names)}@${r.pick(doms)}"
  }

  private def phone(r: Rng): String = {
    val styles = r.nextInt(3)
    styles match {
      case 0 => "+33" + (0 until 9).map(_ => r.nextInt(10)).mkString
      case 1 => "0" + (0 until 9).map(_ => r.nextInt(10)).mkString
      case _ => "(" + (100 + r.nextInt(900)) + ") " + (100 + r.nextInt(900)) + "-" + (1000 + r.nextInt(9000))
    }
  }

  private def apiKey(r: Rng): String = r.nextInt(3) match {
    case 0 => "sk-" + (0 until 24).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    case 1 => "AKIA" + (0 until 16).map(_ => ('A' + r.nextInt(26)).toChar).mkString
    case _ => (0 until 32).map(_ => "0123456789abcdef"(r.nextInt(16))).mkString
  }

  private def toolPayload(r: Rng): String = {
    val t = r.pick(Tools)
    s"""{"name": "$t", "args": {"q": "${sentence(r, "en", 3)}", "limit": ${1 + r.nextInt(20)}}}"""
  }

  /** Generate one conversation. Conversation sizes are power-law
    * (FIXTURES.md §5: a few ~10k-turn convs at the `small` scale to
    * exercise skew); anomalies are injected with fixed per-turn
    * probabilities.
    */
  def conv(seed: Long, convIdx: Long, skewCap: Int = 12000): Seq[Turn] = {
    val r = new Rng(mix64(seed ^ (convIdx * 0x9e3779b97f4a7c15L)))
    val convId = f"c-$convIdx%08d"
    val u = math.max(r.nextDouble(), 1e-9)
    val size = math.min(skewCap, 2 + math.pow(1.0 / u, 0.72).toInt)
    val lang = pickLang(r)
    val out = new scala.collection.mutable.ArrayBuffer[Turn](size)
    var ts = BaseEpochMs + convIdx * 997000L
    var idx = 0
    var prevText: String = null
    var i = 0
    while (i < size) {
      val roleBase =
        if (i == 0 && r.nextDouble() < 0.3) "system"
        else if (r.nextDouble() < 0.12) { "assistant" } // may carry tool
        else if (i % 2 == 1) "assistant"
        else "user"
      var role = roleBase
      var tool: String = null
      var isToolTurn = false
      if (role == "assistant" && r.nextDouble() < 0.25) {
        tool = r.pick(Tools)
      }
      // a tool-role turn sometimes follows an assistant tool call
      if (i > 0 && out.nonEmpty && out.last.role == "assistant" &&
          out.last.tool != null && r.nextDouble() < 0.8) {
        role = "tool"; tool = out.last.tool; isToolTurn = true
      }

      var text =
        if (isToolTurn) toolPayload(r)
        else sentence(r, lang, 4 + r.nextInt(24))

      // ---- anomaly injections (fixed order, fixed probabilities) ----
      val a = r.nextDouble()
      if (a < 0.02) text = r.pick(Sentinels)
      else if (a < 0.04) { // whitespace pollution
        text = "   " + text.replace(" ", "    ") + "  "
      } else if (a < 0.055) { // repetition
        val w = if (lang == "zz") "blah" else r.pick(wordPool(if (lang == "zz") "en" else lang))
        text = (w + " ") * (10 + r.nextInt(30)) + ("aaaa" * (2 + r.nextInt(4)))
      } else if (a < 0.07) { // symbol junk
        text = (0 until 12 + r.nextInt(40)).map(_ => r.pick(IndexedSeq("@", "#", "$", "%", "^", "&", "*", "/", "\\", "~"))).mkString("") + " " + sentence(r, if (lang == "zz") "en" else lang, 2)
      } else if (a < 0.075) { // too long
        text = sentence(r, if (lang == "zz") "en" else lang, 6) * 400
      } else if (a < 0.085) { // too short
        text = IndexedSeq("k", "y", ".", "a")(r.nextInt(4))
      } else if (a < 0.105 && i > 0) { // duplicate of an earlier turn
        text = out(r.nextInt(out.length)).text
      } else if (a < 0.125) { // gibberish burst in an otherwise-ok conv
        text = gibberish(r, 40 + r.nextInt(160))
      }

      // PII decorations on normal prose (independent coin flips)
      if (!isToolTurn && text.length > 10) {
        if (r.nextDouble() < 0.06) text = text + " contact me at " + email(r)
        if (r.nextDouble() < 0.05) text = text + " call " + phone(r)
        if (r.nextDouble() < 0.025) text = text + " token " + apiKey(r)
        if (r.nextDouble() < 0.025) text = text + " you " + r.pick(Slurs)
      }

      // role/tool violations
      val b = r.nextDouble()
      if (b < 0.015) role = r.pick(BadRoles)
      else if (b < 0.03) {
        if (role == "tool") tool = null // tool turn missing tool name
        else if (tool == null) tool = r.pick(Tools) // user/system carrying a tool
      }
      if (b >= 0.03 && role == "user" && tool != null) tool = null

      // turn_idx gap
      if (r.nextDouble() < 0.01 && i > 0) idx += 1 + r.nextInt(3)

      // ts regression
      val dt = 1000L + r.nextInt(120000)
      ts = if (r.nextDouble() < 0.012 && i > 0) ts - 500000L else ts + dt

      out += Turn(convId, idx, role, text, tool, new Timestamp(ts))
      prevText = text
      idx += 1
      i += 1
    }
    out.toSeq
  }

  /** Local (sequential) corpus for the golden oracle + unit tests. */
  def generateLocal(nConvs: Int, seed: Long, skewCap: Int = 2000): Seq[Turn] =
    (0L until nConvs.toLong).flatMap(conv(seed, _, skewCap))

  /** Distributed corpus: one task range → flatMap; rows are identical to
    * [[generateLocal]] regardless of partitioning.
    */
  def generate(spark: SparkSession, nConvs: Long, seed: Long,
               skewCap: Int = 12000, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0L, nConvs, 1L, partitions)
      else spark.range(0L, nConvs)
    base.flatMap(i => conv(seed, i, skewCap))
  }
}
