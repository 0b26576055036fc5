package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAlgos
import graft.scrub.Scrub

/** Literal anomaly payloads from the reference's dirty CLIENTS fixture
  * (/root/reference/DataGuardian/DataGuardianApp/db_configs/
  * test_data.sql) pushed through our machinery — the FIXTURES.md §2
  * transplant, value by value.
  */
class ReferenceAnomalySpec extends AnyFunSuite {

  test("whitespace anomalies (test_data.sql:104,116-128)") {
    assert(Scrub.normalizeWsPlain("     PARIS     ") == "PARIS")
    assert(Scrub.normalizeWsPlain("DE    PAR       DE") == "DE PAR DE")
    assert(Scrub.normalizeWsPlain("MONSIEUuR    ") == "MONSIEUuR")
  }

  test("missing-value sentinels (functions.sql:1541-1544, test_data.sql:140-155)") {
    import graft.rules.RuleConfig.Sentinels
    Seq("-", "?", "!", "=", "nan", "NULL", "MISSINGVALUE", "").foreach { s =>
      assert(Sentinels.contains(Scrub.normalizeWsPlain(s)), s"'$s'")
    }
    // 'inexistant' is NOT a sentinel in the reference either
    assert(!Sentinels.contains("inexistant"))
  }

  test("email anomalies (test_data.sql:34,43,55,64)") {
    def scrub(s: String) = Scrub.scrubPlain(Scrub.normalizeWsPlain(s))._1
    // valid → scrubbed
    assert(scrub("mail eve.clement@gmail.com ok") == "mail <EMAIL> ok")
    // 'clemence evelyne@gmail.com' — only the valid tail is an email
    assert(scrub("clemence evelyne@gmail.com") == "clemence <EMAIL>")
    // malformed stay (no TLD / truncated domain)
    assert(scrub("jeanbaptiste@ wrote") == "jeanbaptiste@ wrote")
    assert(scrub("josef@premier wrote") == "josef@premier wrote")
  }

  test("phone anomalies (test_data.sql:34,49,55)") {
    def scrub(s: String) = Scrub.scrubPlain(Scrub.normalizeWsPlain(s))._1
    assert(scrub("call +33777889911 now") == "call <PHONE> now")
    assert(scrub("call 0033777889955 now") == "call <PHONE> now")
    // truncated phone '0607' is NOT scrubbed (too short)
    assert(scrub("call 0607 now") == "call 0607 now")
  }

  test("repeated letters lower distinct-trigram fraction (test_data.sql:40,146,155)") {
    // MARCHEILLLE / CLEANTOOON / HOBAAAMA-style payloads, lengthened to
    // turn scale as FIXTURES.md prescribes
    val repetitive = "CLEANTOOON " * 8 + "HOBAAAMA " * 6
    val normal = "the results of the experiment were consistent with expectations"
    val r1 = TextAlgos.turnMetrics(Scrub.normalizeWsPlain(repetitive), 3)._3
    val r2 = TextAlgos.turnMetrics(normal, 3)._3
    assert(r1 < 0.3, s"repetitive fraction $r1")
    assert(r2 > 0.5, s"normal fraction $r2")
  }

  test("special-character pollution (test_data.sql:34,64,128)") {
    Seq("CLEM@ENT", "JOS//EPH", "AVENUE@D_ITALIE/").foreach { s =>
      assert(TextAlgos.symbolDensity(s) > 0.1, s)
    }
    // symbol-density junk crosses the drop threshold
    assert(TextAlgos.symbolDensity("&\\^#$%//#%%%$$") > 0.3)
  }

  test("dictionary misspellings get correct JW suggestions (test_data.sql:79,91,136)") {
    // FRENCE→FRANCE etc., as the reference's suggestion join would
    val dict = Seq("FRANCE", "AFRIQUE", "UNITED-STATES-AMERICA", "MARSEILLE")
    def suggest(v: String): Option[String] = {
      val scored = dict.map(d => d -> TextAlgos.jaroWinkler(v, d))
        .filter(_._2 >= 0.85)
      if (scored.isEmpty) None else Some(scored.maxBy(_._2)._1)
    }
    assert(suggest("FRENCE").contains("FRANCE"))
    assert(suggest("IFRIQIA").isEmpty || suggest("IFRIQIA").contains("AFRIQUE"))
    assert(suggest("UNITED-STATS-AMERICA").contains("UNITED-STATES-AMERICA"))
    assert(suggest("MARCHEILLLE").contains("MARSEILLE"))
    assert(suggest("ZZZZZZZ").isEmpty)
  }
}
