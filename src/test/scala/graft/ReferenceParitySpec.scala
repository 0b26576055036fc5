package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.facts.FactDictionaries
import graft.fixtures.ClientsFixture
import graft.functions.TextAlgos
import graft.ops.{ReferenceCorrections, SemanticTypes, Suggest}

/** Semantic spot-checks of the reference-parity operators. The DuckDB
  * oracle proves Spark == SQL; these assert the SHARED semantics are the
  * reference's (guarding against both sides being wrong identically).
  */
class ReferenceParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val chainOut = {
    val spec = ReferenceCorrections.ChainSpec("clients_id", Seq(
      "codcli" -> "unknown", "civcli" -> "civilite", "nomcli" -> "unknown",
      "prencli" -> "unknown", "catcli" -> "integer", "adncli" -> "numerique",
      "adrcli" -> "adresse", "cpcli" -> "numerique", "vilcli" -> "ville",
      "payscli" -> "pays", "mailcli" -> "email", "telcli" -> "phone",
      "datnaiscli" -> "date", "dpremcontactcli" -> "date",
      "obscli" -> "unknown", "remcli" -> "unknown", "genrecli" -> "unknown"))
    ReferenceCorrections.applyChain(ClientsFixture.df(spark), spec,
      FactDictionaries.countriesDf(spark), FactDictionaries.citiesDf(spark),
      FactDictionaries.civilitiesDf(spark), FactDictionaries.bloodGroupsDf(spark))
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("jaro-winkler is byte-wise like pg_similarity/DuckDB") {
    // multi-byte É counts as 2 units; DuckDB returns 0.90606... here
    assert(math.abs(TextAlgos.jaroWinkler("États-Unis", "Etats-Unis") - 0.906061) < 1e-6)
    // ASCII unchanged by the byte switch
    assert(TextAlgos.jaroWinkler("MARTHA", "MARHTA") > 0.94)
  }

  test("country suggestion channels (functions.sql:1665-1727)") {
    import spark.implicits._
    val anoms = Seq((1, "FRA"), (2, "US"), (3, "Germany"), (4, "IRAQ"),
      (5, "FRENCE"), (6, "france")).toDF("id_ligne", "anomaly")
    val top = Suggest.countryTop1(anoms, FactDictionaries.countriesDf(spark), 0.85, "fr")
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(top(1) == "France")    // exact 3L code channel
    assert(top(2) == "États-Unis") // exact 2L code channel
    assert(top(3) == "Allemagne") // translated-name channel (en → fr)
    assert(top(4) == "Irak")      // translated channel via upper() equality
    assert(top(6) == "France")    // raw-name channel, lowercase close enough
    // case-sensitive JW: the reference does NOT fix all-caps misspellings
    assert(!top.contains(5), s"FRENCE must have no suggestion, got $top")
  }

  test("correction chain end state on the CLIENTS fixture (api.py:812-906 order)") {
    def str_(id: Int, c: String) = chainOut(id).getAs[String](c)
    def isNull(id: Int, c: String) = chainOut(id).isNullAt(chainOut(id).fieldIndex(c))
    assert(str_(15, "payscli") == "IRAK", "IRAQ fixed via translated channel, then UPPER")
    assert(str_(20, "payscli") == "FRENCE", "all-caps misspelling survives (case-sensitive JW)")
    assert(str_(41, "payscli") == "FRANCE", "'france' suggested then UPPER")
    // emails: invalid (TLD whitelist) nulled, valid lowercased
    assert(isNull(8, "mailcli"), "'jeanbaptiste@' nulled")
    assert(str_(1, "mailcli") == "eve.clement@gmail.com")
    // numerique string column: '8 BIS' fails ^-?\d*\.?\d+$ and is nulled
    assert(isNull(4, "adncli"))
    // civility: 'Madam' ~ 'Madame' fixed; 'MONSIEUuR' unfixable, capitalized
    assert(str_(5, "civcli") == "Madame")
    assert(str_(39, "civcli") == "Monsieuur")
    // outlier CATCLI=-3 replaced by the rounded mean
    assert(chainOut(16).getAs[Int]("catcli") != -3)
    // the spaces step only TRIMS (reference quirk): internal runs survive
    assert(str_(24, "vilcli").contains("    "),
      s"internal spaces must survive, got '${str_(24, "vilcli")}'")
    // empty-string sentinel → NULL
    assert(isNull(1, "obscli"))
    // ville homogenized to str.capitalize
    assert(str_(2, "vilcli") == "Paris")
  }

  test("email TLD whitelist is the violation rule (functions.sql:1565-1577)") {
    import spark.implicits._
    val df = Seq("a.b@mail.fr", "x@y.com", "x@y.dev", "jeanbaptiste@", "a b@mail.fr")
      .toDF("v").select(SemanticTypes.emailViolation(col("v")).as("bad"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(false, false, true, true, true)) // .dev not in the 1990s-ish whitelist
  }

  test("10-type vote replicates the civilite dead-branch (utils.py:1065)") {
    import spark.implicits._
    // a pure-civility column: every over-60 branch fails (the civilite
    // branch tests email_percentage — the reference bug), so the type
    // comes from the majority fallback
    val civ = (0 until 30).map(i => (i.toLong, FactDictionaries.civilities(i % 8)))
      .toDF("id", "v")
    val res = SemanticTypes.majorityTypeFull(civ, "v", "id").head()
    assert(res.getString(0) == "civilite")
    assert(!SemanticTypes.over60Precedence.contains("civilite"))
    // date strings in DD-MM-YYYY type as phone (the reference's
    // TYPE_TELEPHONE regex matches digit-dash strings of length 10-20
    // and TYPE_DATE has no DD-MM-YYYY alternative)
    val dates = (0 until 30).map(i => (i.toLong, f"${i % 28 + 1}%02d-06-1951"))
      .toDF("id", "v")
    assert(SemanticTypes.majorityTypeFull(dates, "v", "id").head().getString(0) == "phone")
  }

  test("reference score formula (utils.py:491-509)") {
    import spark.implicits._
    // hand-computable frame: 2 value columns + id, 4 rows.
    // colA: 1 missing sentinel; colB (email): 2 TLD violations.
    // score = (1/4 + 2/4) * 100 / (3-1) = 37.5 → stored 62.5
    val df = Seq(
      (1, "x", "a@b.com"), (2, "-", "bad@"), (3, "y", "c@d.fr"), (4, "z", "nope"))
      .toDF("rid", "cola", "colb")
    val spec = ReferenceCorrections.ChainSpec("rid",
      Seq("cola" -> "unknown", "colb" -> "email"))
    val score = ReferenceCorrections.referenceScore(df, spec).head().getDouble(0)
    assert(math.abs(score - 62.5) < 1e-9, s"score $score")
  }

  test("correction chain on degenerate frames: all-null, all-sentinel, empty") {
    import spark.implicits._
    val spec = ReferenceCorrections.ChainSpec("rid", Seq(
      "p" -> "pays", "v" -> "ville", "cv" -> "civilite", "m" -> "email",
      "u" -> "unknown", "n" -> "integer"))
    def chain(df: org.apache.spark.sql.DataFrame) =
      ReferenceCorrections.applyChain(df, spec,
        FactDictionaries.countriesDf(spark), FactDictionaries.citiesDf(spark),
        FactDictionaries.civilitiesDf(spark), FactDictionaries.bloodGroupsDf(spark))

    // all-null string columns: suggestion joins see zero anomalies,
    // homogenizers pass nulls through (distinct n values — identical
    // rows would legitimately be deleted as DOUBLONS)
    val allNull = Seq(
      (1, Option.empty[String], Option.empty[String], Option.empty[String],
        Option.empty[String], Option.empty[String], 5),
      (2, None, None, None, None, None, 7))
      .toDF("rid", "p", "v", "cv", "m", "u", "n")
    val outNull = chain(allNull).collect()
    assert(outNull.length == 2)
    assert(outNull.forall(r => (1 to 5).forall(r.isNullAt)))
    assert(outNull.map(_.getInt(6)).sorted.toSeq == Seq(5, 7)) // within IQR bounds
    // and identical all-null rows ARE full-row duplicates: keep-first
    val dupped = chain(allNull.withColumn("n", lit(5))).collect()
    assert(dupped.length == 1 && dupped.head.getInt(0) == 1)

    // all-sentinel values null out before any dictionary logic runs
    val sentinelFrame = Seq((1, "-", "?", "nan", "NULL", "", 3))
      .toDF("rid", "p", "v", "cv", "m", "u", "n")
    val outSent = chain(sentinelFrame).head()
    assert((1 to 5).forall(outSent.isNullAt), s"got $outSent")

    // empty frame: chain is a no-op, schema preserved
    val empty = allNull.where(lit(false))
    val outEmpty = chain(empty)
    assert(outEmpty.count() == 0)
    assert(outEmpty.columns.toSeq == Seq("rid", "p", "v", "cv", "m", "u", "n"))

    // diagnostic on the degenerate frames completes at every level
    graft.ops.Diagnostic.levels.foreach { l =>
      assert(graft.ops.Diagnostic.findings(sentinelFrame, spec, l).count() >= 5)
      assert(graft.ops.Diagnostic.findings(empty, spec, l).count() == 0)
    }
  }

  test("date reformat tries the 14 reference formats in order (utils.py:1323-1348)") {
    import spark.implicits._
    val got = Seq("17-06-1951", "06-17-1951", "Jun 17, 1951", "31-02-2020")
      .toDF("d").select(SemanticTypes.reformatDate(col("d"))).collect().map(_.getString(0))
    assert(got(0) == "06-17-1951") // %d-%m-%Y wins before %m-%d-%Y
    assert(got(1) == "06-17-1951") // %d fails (month 17), %m-%d-%Y catches
    assert(got(2) == "06-17-1951")
    assert(got(3) == "Format de date inconnu.") // Feb 31 invalid everywhere
  }
}
