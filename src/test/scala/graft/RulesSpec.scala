package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.oracle.OracleFilter
import graft.pipeline.QualityFilter
import graft.schema.{LabeledTurn, Turn}

/** Per-rule unit tests on hand-written rows — the anomaly catalog of the
  * reference's dirty CLIENTS fixture (db_configs/test_data.sql)
  * transplanted into transcript payloads (FIXTURES.md §2). Each case is
  * asserted against BOTH the oracle and the Spark pipeline.
  */
class RulesSpec extends AnyFunSuite {

  private val ts0 = new Timestamp(1700000000000L)
  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  private def turn(idx: Int, role: String, text: String, tool: String = null,
                   t: Timestamp = null): Turn =
    Turn("c-1", idx, role, text, tool, if (t == null) ts(idx) else t)

  /** Label one conversation through both implementations and return the
    * (oracle, spark) results sorted by turn.
    */
  private def labelBoth(turns: Seq[Turn]): (Seq[LabeledTurn], Seq[LabeledTurn]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val o = OracleFilter.run(turns)
    val s = QualityFilter.label(spark.createDataset(turns))
      .as[LabeledTurn].collect().sortBy(t => (t.conv_id, t.turn_idx)).toSeq
    (o, s)
  }

  private def reasonsOf(turns: Seq[Turn]): Seq[Seq[String]] = {
    val (o, s) = labelBoth(turns)
    assert(o.map(_.drop_reasons.toList) == s.map(_.drop_reasons.toList),
      "oracle vs spark disagreement")
    o.map(_.drop_reasons)
  }

  private val okText =
    "could you please explain how this function works and what it returns"

  test("empty / sentinel text drops (F1: MISSINGVALUE NULL - = ! ? nan)") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "-"),
      turn(2, "user", "   MISSINGVALUE "),
      turn(3, "assistant", null),
      turn(4, "user", "    "),
      turn(5, "assistant", "nan")))
    assert(rs(0).isEmpty)
    assert(rs.drop(1).forall(_.contains("empty_text")))
  }

  test("length bounds") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "k"),
      turn(2, "user", "x " * 6000))) // 12000 chars > MaxLen
    assert(rs(0).isEmpty)
    assert(rs(1).contains("length"))
    assert(rs(2).contains("length"))
  }

  test("symbol density (CLEM@ENT / JOS//EPH style pollution)") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "@#$%^&*@#$%^&* some tex@t"),
      turn(2, "tool", """{"a": {"b": [1, 2]}}""", tool = "search")))
    assert(rs(0).isEmpty)
    assert(rs(1).contains("symbol_density"))
    assert(!rs(2).contains("symbol_density"), "tool payloads exempt")
  }

  test("repetition (CLEANTOOON / HOBAAAMA / repeated words)") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "spam spam spam spam spam spam spam spam spam spam spam"),
      turn(2, "user", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")))
    assert(rs(0).isEmpty)
    assert(rs(1).contains("repetition"))
    assert(rs(2).contains("repetition"))
  }

  test("bad role / bad tool (dictionary membership)") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "operator", okText + " once more"),
      turn(2, "user", okText + " with a tool attached", tool = "search"),
      turn(3, "tool", """{"r": 1}""", tool = null),
      turn(4, "assistant", okText + " final answer here", tool = "search")))
    assert(rs(0).isEmpty)
    assert(rs(1).contains("bad_role"))
    assert(rs(2).contains("bad_tool"))
    assert(rs(3).contains("bad_tool"))
    assert(rs(4).isEmpty)
  }

  test("turn_idx contiguity + ts regression windows") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", okText + " indeed"),
      turn(3, "user", okText + " again today"), // gap: 1 -> 3
      turn(4, "assistant", okText + " more words here", t = ts(1)))) // ts regress
    assert(rs(0).isEmpty)
    assert(rs(1).isEmpty)
    assert(rs(2).contains("non_contiguous_turn"))
    assert(rs(3).contains("ts_regression"))
  }

  test("first turn must be turn_idx 0") {
    val rs = reasonsOf(Seq(turn(2, "user", okText)))
    assert(rs(0).contains("non_contiguous_turn"))
  }

  test("duplicate turns within a conversation (C121-C126 analog)") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "the results were consistent with our expectations"),
      turn(2, "user", okText), // exact dup of turn 0
      turn(3, "user", "  " + okText + "  "))) // dup modulo whitespace
    assert(rs(0).isEmpty)
    assert(rs(2).contains("duplicate_turn"))
    assert(rs(3).contains("duplicate_turn"))
  }

  test("language filter: es drops, allowed langs keep, tool exempt") {
    val es = "creo que deberiamos mirar los datos antes de tomar una decision sobre el cambio"
    val rs = reasonsOf(Seq(
      turn(0, "user", es),
      turn(1, "assistant", es + " y tambien las pruebas del experimento"),
      turn(2, "user", es + " cada manana ella lee las noticias")))
    assert(rs.forall(_.contains("lang")))

    val rs2 = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "le temps aujourd'hui est tres agreable et nous allons faire une promenade"),
      turn(2, "user", "das wetter ist heute sehr schoen und wir planen einen kurzen spaziergang")))
    assert(rs2.forall(_.isEmpty))
  }

  test("perplexity: gibberish drops, normal prose keeps") {
    val rs = reasonsOf(Seq(
      turn(0, "user", okText),
      turn(1, "assistant", "xqzwjv kfpqx mzzkrw qqvtxp zzfkwj pqxmzr wvkqjx"),
      turn(2, "tool", "xqzwjv kfpqx mzzkrw qqvtxp", tool = "search")))
    assert(rs(0).isEmpty)
    assert(rs(1).contains("perplexity"))
    assert(!rs(2).contains("perplexity"), "tool turns exempt from ppl")
  }

  test("PII scrubbing end-to-end text equality") {
    val (o, s) = labelBoth(Seq(
      turn(0, "user",
        "reach me at alice@example.com or +33612345678, token sk-abcdefghijklmnopqrstuv, you frakk"),
      turn(1, "assistant", "noted:  I  will   not share it")))
    assert(o.map(_.scrubbed_text) == s.map(_.scrubbed_text))
    assert(s(0).scrubbed_text ==
      "reach me at <EMAIL> or <PHONE>, token <KEY>, you <SLUR>")
    assert(s(0).scrub_counts == Map("email" -> 1, "phone" -> 1, "key" -> 1, "slur" -> 1))
    assert(s(1).scrubbed_text == "noted: I will not share it")
  }

  test("sub-rule RE2 rewrites == Java lookahead originals (date rules)") {
    // exhaustive-ish corpus: every fixture-style day/month/year shape
    // plus adversarial digit runs around the year boundaries
    import java.util.regex.Pattern
    val days = Seq("00", "01", "15", "29", "31", "32", "45", "99")
    val months = Seq("00", "01", "02", "04", "09", "11", "12", "13")
    val years = Seq("0000", "9999", "0001", "1999", "99", "999", "00", "09",
      "123", "12345", "99990")
    val seps = Seq("-", "/", " ")
    val mons = Seq("Jan", "Mar", "Dec", "Foo")
    val corpus =
      (for { d <- days; m <- months; y <- years; s <- seps }
        yield Seq(s"$y$s$m$s$d", s"$d$s$m$s$y", s"$m$s$d$s$y")).flatten ++
      (for { d <- days; mo <- mons; y <- years }
        yield s"$d $mo $y") ++
      Seq("x2020-01-45y", "12020-01-45", "2020-01-451", "31/12/99x",
        "31/12/9991", "01 Jan 991", "01 Jan 99 ", "a01 Jan 123b")
    graft.ops.SemanticTypes.subRules.filter(_.re2Override.isDefined).foreach { r =>
      val orig = Pattern.compile(r.regex)
      val re2 = Pattern.compile(r.re2)
      corpus.foreach { v =>
        assert(orig.matcher(v).find() == re2.matcher(v).find(),
          s"rule '${r.name}' diverges on '$v': java=${orig.matcher(v).find()} re2=${re2.matcher(v).find()}")
      }
    }
  }

  test("IQR perplexity variant: data-driven bounds flip only the ppl rule") {
    import graft.rules.RuleConfig
    val spark = TestSpark.spark
    import spark.implicits._
    val turns = graft.gen.TranscriptGen.generateLocal(80, seed = 7, skewCap = 200)
    val scored = QualityFilter.score(spark.createDataset(turns))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)

    val (lo, hi) = QualityFilter.pplIqrBounds(scored)
    // bounds must equal locally computed quantile_cont quartiles ± 1.5·IQR
    val ppls = scored.collect()
      .filter(t => !t.is_empty && t.norm_len >= RuleConfig.PplMinChars &&
        t.role != "tool")
      .map(_.ppl).sorted
    def qc(p: Double): Double = {
      val rn = p * (ppls.length - 1)
      val (f, c) = (math.floor(rn), math.ceil(rn))
      if (f == c) ppls(f.toInt)
      else (c - rn) * ppls(f.toInt) + (rn - f) * ppls(c.toInt)
    }
    val iqr = qc(0.75) - qc(0.25)
    assert(lo == qc(0.25) - 1.5 * iqr && hi == qc(0.75) + 1.5 * iqr)

    // only the perplexity rule may differ from the default labeling
    def byTurn(df: org.apache.spark.sql.DataFrame) = df
      .select($"conv_id", $"turn_idx", $"drop_reasons")
      .as[(String, Int, Seq[String])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val base = byTurn(QualityFilter.labelScored(scored))
    val variant = byTurn(QualityFilter.labelScored(scored, Some((lo, hi))))
    assert(base.keySet == variant.keySet)
    base.foreach { case (k, reasons) =>
      assert(reasons.filterNot(_ == RuleConfig.RulePpl) ==
        variant(k).filterNot(_ == RuleConfig.RulePpl), s"non-ppl drift at $k")
    }
    // and the variant's ppl labels are exactly the out-of-bounds turns
    val scoredMap = scored.collect()
      .map(t => (t.conv_id, t.turn_idx) -> t).toMap
    variant.foreach { case (k, reasons) =>
      val t = scoredMap(k)
      val eligible = !t.is_empty && t.norm_len >= RuleConfig.PplMinChars &&
        t.role != "tool"
      val expect = eligible && (t.ppl < lo || t.ppl > hi)
      assert(reasons.contains(RuleConfig.RulePpl) == expect, s"ppl label at $k")
    }
    scored.unpersist()
  }

  test("boilerplate drop keys: raw path == scored path, exemptions hold") {
    val spark = TestSpark.spark
    import spark.implicits._
    // canned assistant line (norm_len >= BoilerplateMinLen) repeats
    // across both conversations; "ok thanks" is too short; the tool
    // payload repeats but tool turns are exempt; c-u's turn is unique
    val canned = "thank you for contacting support how can i help"
    val toolPayload = """{"status": "ok", "rows": 42, "elapsed_ms": 7}"""
    def conv(id: String) = Seq(
      Turn(id, 0, "user", okText, null, ts(0)),
      Turn(id, 1, "assistant", canned, null, ts(1)),
      Turn(id, 2, "user", "ok thanks", null, ts(2)),
      Turn(id, 3, "tool", toolPayload, "search", ts(3)))
    val unique = Seq(
      Turn("c-u", 0, "user", okText + " in much more detail please", null, ts(0)),
      // null and sentinel texts recur across convs but is_empty exempts
      // them — the raw path's normalize+sentinel check must agree with
      // the scored stage on these too
      Turn("c-u", 1, "assistant", null, null, ts(1)),
      Turn("c-v", 0, "user", "   MISSINGVALUE ", null, ts(0)),
      Turn("c-v", 1, "assistant", null, null, ts(1)))
    val ds = spark.createDataset(conv("c-a") ++ conv("c-b") ++ unique)
    val cfg = QualityFilter.BoilerplateConfig()

    def keys(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Int)].collect().toSet
    val raw = keys(QualityFilter.boilerplateDropKeysRaw(ds, cfg))
    val viaScore = keys(QualityFilter.boilerplateDropKeys(QualityFilter.score(ds), cfg))
    assert(raw == viaScore, "raw census must equal the scored-stage census")
    // okText (turn 0) and canned (turn 1) recur across c-a/c-b; the
    // short turn, the tool turn, and c-u's unique turn are exempt
    assert(raw == Set("c-a" -> 0, "c-a" -> 1, "c-b" -> 0, "c-b" -> 1))

    // application: flagged turns lose keep and gain the reason LAST
    val labeled = QualityFilter.withBoilerplate(
      QualityFilter.label(ds), QualityFilter.boilerplateDropKeysRaw(ds, cfg))
    val byKey = labeled
      .select($"conv_id", $"turn_idx", $"keep", $"drop_reasons")
      .as[(String, Int, Boolean, Seq[String])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    raw.foreach { k =>
      val (keep, reasons) = byKey(k)
      assert(!keep && reasons.lastOption.contains(graft.rules.RuleConfig.RuleBoilerplate), s"$k")
    }
    (byKey.keySet -- raw).foreach { k =>
      assert(!byKey(k)._2.contains(graft.rules.RuleConfig.RuleBoilerplate), s"$k")
    }
  }
}
