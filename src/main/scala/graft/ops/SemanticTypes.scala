package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.facts.FactDictionaries

/** Semantic-type detection (SURVEY.md §2.2 F5/F8/F12 + A16): the full
  * regex registry from the reference's constraint store
  * (db_configs/data_types.json), the 12-label date-format classifier and
  * 14-format date reformatter (utils.py:1266-1348), the TLD-whitelist
  * email violation (functions.sql:1565-1577), and the sampled 10-type
  * majority vote (utils.py:999-1106) as one aggregation instead of a
  * driver loop.
  *
  * Where a Spark predicate has a DuckDB-oracle counterpart, this object
  * also renders the equivalent SQL fragment from the SAME table, so the
  * two sides cannot drift.
  */
object SemanticTypes {

  // ------------------------------------------------- type predicates
  // (data_types.json "semantiques", :127-162)
  val EmailTypeRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
  val PhoneTypeRe = "^\\+?[0-9.\\s-]{10,20}$"
  val NumericTypeRe = "^-?\\d*\\.?\\d+$"
  // TYPE_DATE (data_types.json:143-147), full-anchored
  val DateTypeRe = "^(?:(\\d{4})-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])|((0[1-9]|1[0-2]))-(0[1-9]|[12]\\d|3[01])-(\\d{4})|(0[1-9]|[12]\\d)/(0[1-9]|1[0-2])/(\\d{2}|\\d{4})|\\d{2} (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) (\\d{2}|\\d{4}))$"
  // TYPE_ADRESSE (data_types.json:148-152). The reference's JSON value
  // spells the word boundary as "\b", which JSON decodes to a BACKSPACE
  // character — the compiled regex can never match ordinary text and
  // is_address is effectively always false. We fix the escaping (real
  // \b) and note the divergence; the A16 vote replicates the part of
  // the reference behavior that is visible (adresse can win the
  // over-60% branch).
  val AddressTypeRe = "(?i)\\b(rue|avenue|boulevard|place|chemin|allée|voie|impasse|square|route|bvd|av|rd)\\b"
  // TYPE_GROUPE_SANGUIN (:153-157) / TYPE_CIVILITE (:158-162), search
  // semantics (re.search), case-sensitive like the reference
  val BloodGroupRe = "A\\+|A-|B\\+|B-|AB\\+|AB-|O\\+|O-"
  val CivilityRe = "Mme|Mlle|Mr|Dr|Pr|Monsieur|MONSIEUR|Madame|MADAME|Mademoiselle|MADEMOISELLE"
  // is_amount (utils.py:839-849): spaces removed, then ^digits symbol$.
  // The reference fetches the symbol list from a currency API at run
  // time; offline we pin the common symbols (documented divergence).
  val CurrencySymbols = Seq("$", "€", "£", "¥", "₹", "₩", "₽")
  val AmountRe: String =
    "^\\d+(" + CurrencySymbols.map(java.util.regex.Pattern.quote).mkString("|") + ")$"
  private val AmountReSql: String =
    "^\\d+(" + CurrencySymbols.map(s => if (s == "$") "\\$" else s).mkString("|") + ")$"

  def isEmail(c: Column): Column = c.rlike(EmailTypeRe)
  def isPhone(c: Column): Column = c.rlike(PhoneTypeRe)
  def isNumeric(c: Column): Column = c.rlike(NumericTypeRe)
  def isDate(c: Column): Column = c.rlike(DateTypeRe)
  def isAddress(c: Column): Column = c.rlike(AddressTypeRe)
  def isBloodGroup(c: Column): Column = c.rlike(BloodGroupRe)
  def isCivility(c: Column): Column = c.rlike(CivilityRe)
  def isAmount(c: Column): Column = regexp_replace(c, " ", "").rlike(AmountRe)

  /** F5: the reference's email VIOLATION is the TLD-whitelist negative
    * regex over LOWER(value) (email_not_matching_regex,
    * functions.sql:1565-1577) — not a generic email regex.
    */
  val EmailTldWhitelistRe: String =
    "^([a-z0-9_\\-]+\\.)*[a-z0-9_\\-]+@([a-z0-9_\\-]+\\.)+" +
      "(com|org|edu|net|ca|au|coop|de|ee|es|fm|fr|gr|ie|in|it|jp|me|nl|nu|ru|uk|us|za)$"
  def emailViolation(c: Column): Column = !lower(c).rlike(EmailTldWhitelistRe)

  /** VALEUR_NUMERIQUE_INCORRECTE (numerique_not_matching_regex,
    * functions.sql:1580-1592): LOWER(value) fails the numeric regex.
    */
  def numericViolation(c: Column): Column = !lower(c).rlike(NumericTypeRe)

  // ------------------------------------- constraint-registry sub-rules
  // (data_types.json "specifiques", :19-125). Match = finding. `regex`
  // is the reference's Java pattern (what the Spark query runs);
  // `re2` is an RE2-compatible equivalent for the DuckDB oracle. Most
  // rules are RE2-safe as-is; the DATE range rules use negative
  // lookaheads, rewritten below as plain alternations (equivalence
  // asserted by RulesSpec under java.util.regex — the rewrites avoid
  // every lookahead, so they also run under RE2).
  final case class SubRule(dataType: String, name: String, regex: String,
                           re2Override: Option[String] = None) {
    def re2: String = re2Override.getOrElse(regex)
  }

  /** `\d{4}` minus 0000 and 9999, lookahead-free: first digit 1-8, or
    * leading 0/9 with at least one digit ≠ 0/≠ 9 somewhere after.
    */
  private val YearNot0000Or9999 =
    "(?:[1-8]\\d{3}|0\\d{2}[1-9]|0\\d[1-9]\\d|0[1-9]\\d{2}|9\\d{2}[0-8]|9\\d[0-8]\\d|9[0-8]\\d{2})"

  /** A pattern that matches nothing (RE2 and Java agree): the
    * MM-DD-YYYY range rule's year lookahead excludes EVERY 4-digit
    * string while `\d{4}` requires one — the reference rule is dead
    * code, preserved as such.
    */
  private val NeverMatches = "[^\\s\\S]"

  val subRules: Seq[SubRule] = Seq(
    SubRule("email", "caracteres speciaux sur email", "[^a-zA-Z0-9_@.]"),
    SubRule("email", "domaine invalide",
      "(?:[^\\s@]+@(?:(?:[^\\s@.]+\\.)+[^\\s@.]{2,}|[^\\s@.]*[^-\\s\\w.][^\\s@.]*|[^\\s@.]*[-.]{2,}[^\\s@.]*|[^\\s@.]*\\.[^\\s@.]*\\.))"),
    SubRule("email", "depasse la longueur maximale", "^.{255,}$"),
    SubRule("montant", "presence de delimiteurs",
      "^(?:(?:\\d{1,3})(?:(?:,\\d{3})*(?:\\.\\d*)?|(?:\\.\\d{3})*(?:,\\d*)?))$"),
    SubRule("montant", "plusieurs symboles sur la monnaie",
      "[0-9]+(?:[.,][0-9]+)*([^\\w\\s.,\\-`]){2,}"),
    SubRule("montant", "delimiteurs non uniformes",
      "^(?:(\\d{1,3}(\\.\\d{3})*,\\d{2,3})|(\\d{1,3}(,\\d{3})*\\.\\d{2,3}))$"),
    SubRule("montant", "delimiteurs avec virgules", "^(\\d{1,3})(,\\d{3})*$"),
    SubRule("telephone", "presence d'indicateur dans le numero",
      "^\\+?\\d{1,3}[-.\\s]?\\d{1,15}$"),
    SubRule("telephone", "presence de caracteres invalides dans le numero",
      "[^0-9 \\-()+]"),
    SubRule("telephone", "presence de delimiteurs invalides", "[^0-9 \\-.]"),
    SubRule("date", "plage irrealiste AAAA-MM-JJ",
      "(?:[^\\d]|^)(?!0000|9999)(\\d{4})-(?:0[13-9]|1[0-2])-(?:3[2-9]|[4-9]\\d)|(?:[^\\d]|^)(\\d{4})-(?:0[469]|11)-(?:31|[4-9]\\d)|(?:[^\\d]|^)(\\d{4})-02-(?:3[0-9]|[4-9]\\d)",
      // the (?!0000|9999) year guard only applies to the first branch
      Some("(?:[^\\d]|^)" + YearNot0000Or9999 + "-(?:0[13-9]|1[0-2])-(?:3[2-9]|[4-9]\\d)" +
        "|(?:[^\\d]|^)\\d{4}-(?:0[469]|11)-(?:31|[4-9]\\d)" +
        "|(?:[^\\d]|^)\\d{4}-02-(?:3[0-9]|[4-9]\\d)")),
    SubRule("date", "plage irrealiste MM-DD-YYYY",
      "(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])-(?!(0000|000[1-9]|00[1-9][0-9]|0[1-9][0-9]{2}|[1-9][0-9]{3}))(?!02-3[01]|02-30|04-3[01]|06-3[01]|09-3[01]|11-3[01]|02-29|04-31|06-31|09-31|11-31)\\d{4}",
      Some(NeverMatches)),
    SubRule("date", "plage irrealiste DD/MM/YY(YY)",
      // the year lookahead rejects every 4-digit continuation, so the
      // rule fires exactly on 2-3-digit years not followed by a digit
      "(0[1-9]|[12][0-9]|3[01])/(0[1-9]|1[0-2])/(?!(00|0[1-9])\\d{2}|[1-9]\\d{3})\\d{2,4}",
      Some("(0[1-9]|[12][0-9]|3[01])/(0[1-9]|1[0-2])/\\d{2,3}([^0-9]|$)")),
    SubRule("date", "plage irrealiste DD MMM YY",
      "(0[1-9]|[12][0-9]|3[01])\\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\\s+(?!(00|0[1-9])\\d{2}|[1-9]\\d{3})\\d{2}",
      Some("(0[1-9]|[12][0-9]|3[01])\\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\\s+\\d{2}(\\d([^0-9]|$)|[^0-9]|$)")),
    SubRule("numerique", "erreur de format dans le chiffre",
      "^\\d+(?:\\.\\d+)?$")
  )

  def subRuleFlag(c: Column, r: SubRule): Column = c.rlike(r.regex)

  // -------------------------------------------- date classification
  /** F8: the reference's 12 date-format labels (utils.py:1266-1289),
    * PREFIX-matched (re.match) in declaration order — quirks preserved:
    * no end anchor, and '\d{2} Mon \d{4}' strings hit the earlier
    * 'MM Mon YYYY' pattern before 'DD Mon YYYY (English)'.
    */
  val dateLabelFormats: Seq[(String, String)] = Seq(
    ("\\d{4}-\\d{2}-\\d{2}", "YYYY-MM-DD"),
    ("\\d{2}-\\d{2}-\\d{4}", "MM-DD-YYYY"),
    ("\\d{2}/\\d{2}/\\d{4}", "MM/DD/YYYY"),
    ("\\d{4}/\\d{2}/\\d{2}", "YYYY/MM/DD"),
    ("\\d{2}\\.\\d{2}\\.\\d{4}", "MM.DD.YYYY"),
    ("\\d{4}\\.\\d{2}\\.\\d{2}", "YYYY.MM.DD"),
    ("\\d{2}\\s[A-Z][a-z]{2}\\s\\d{4}", "MM Mon YYYY"),
    ("[A-Z][a-z]{2}\\s\\d{2},\\s\\d{4}", "Mon DD, YYYY"),
    ("\\d{2}\\s(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\\s\\d{4}", "DD Mon YYYY (English)"),
    ("\\d{2}\\s(janv\\.|févr\\.|mars|avr\\.|mai|juin|juil\\.|août|sept\\.|oct\\.|nov\\.|déc\\.)\\s\\d{4}", "DD Mon YYYY (French)"),
    ("\\d{2}/\\d{2}/\\d{2}", "DD/MM/YY"),
    ("\\d{2}-\\d{2}-\\d{2}", "DD-MM-YY")
  )

  val UnknownDateLabel = "Format de date inconnu"

  def classifyDateFormat(c: Column): Column =
    dateLabelFormats.foldRight(lit(UnknownDateLabel): Column) {
      case ((re, label), acc) => when(c.rlike("^" + re), lit(label)).otherwise(acc)
    }

  /** DuckDB rendering of [[classifyDateFormat]] over column `expr`. */
  def classifyDateFormatSql(expr: String): String =
    dateLabelFormats.map { case (re, label) =>
      s"WHEN regexp_matches($expr, '^${re.replace("'", "''")}') THEN '$label'"
    }.mkString("CASE ", " ", s" ELSE '$UnknownDateLabel' END")

  // ------------------------------------------------ date reformatting
  /** C11: the reference's 14 strptime formats tried in order
    * (utils.py:1323-1348), output %m-%d-%Y, else the unknown sentinel.
    * Each format carries a shape-guard regex so the Spark (Java
    * formatter) and DuckDB (C strptime) sides pick the SAME format —
    * the two parsers disagree about things like 2-digit %Y otherwise.
    */
  val parseFormats: Seq[(String, String, String)] = Seq(
    ("^\\d{4}-\\d{2}-\\d{2}$", "yyyy-MM-dd", "%Y-%m-%d"),
    ("^\\d{2}-\\d{2}-\\d{4}$", "dd-MM-yyyy", "%d-%m-%Y"),
    ("^\\d{2}-\\d{2}-\\d{4}$", "MM-dd-yyyy", "%m-%d-%Y"),
    ("^\\d{4}/\\d{2}/\\d{2}$", "yyyy/MM/dd", "%Y/%m/%d"),
    ("^\\d{2}/\\d{2}/\\d{4}$", "dd/MM/yyyy", "%d/%m/%Y"),
    ("^\\d{2}/\\d{2}/\\d{4}$", "MM/dd/yyyy", "%m/%d/%Y"),
    ("^\\d{4}\\.\\d{2}\\.\\d{2}$", "yyyy.MM.dd", "%Y.%m.%d"),
    ("^\\d{2}\\.\\d{2}\\.\\d{4}$", "dd.MM.yyyy", "%d.%m.%Y"),
    ("^\\d{2}\\.\\d{2}\\.\\d{4}$", "MM.dd.yyyy", "%m.%d.%Y"),
    ("^\\d{4} \\d{2} \\d{2}$", "yyyy MM dd", "%Y %m %d"),
    ("^\\d{2} \\d{2} \\d{4}$", "dd MM yyyy", "%d %m %Y"),
    ("^\\d{2} \\d{2} \\d{4}$", "MM dd yyyy", "%m %d %Y"),
    ("^[A-Za-z]{3} \\d{2}, \\d{4}$", "MMM dd, yyyy", "%b %d, %Y"),
    ("^\\d{2} [A-Za-z]{3} \\d{4}$", "dd MMM yyyy", "%d %b %Y")
  )

  val UnknownDateSentinel = "Format de date inconnu."

  def reformatDate(c: Column): Column = {
    val parsed = coalesce(parseFormats.map { case (guard, java, _) =>
      when(c.rlike(guard), try_to_timestamp(c, lit(java)))
    }: _*)
    when(parsed.isNotNull, date_format(parsed, "MM-dd-yyyy"))
      .otherwise(lit(UnknownDateSentinel))
  }

  /** DuckDB rendering of [[reformatDate]] over column `expr`. */
  def reformatDateSql(expr: String): String = {
    val parsed = parseFormats.map { case (guard, _, duck) =>
      s"CASE WHEN regexp_matches($expr, '${guard.replace("'", "''")}') THEN try_strptime($expr, '$duck') END"
    }.mkString("coalesce(", ", ", ")")
    s"coalesce(strftime($parsed, '%m-%d-%Y'), '$UnknownDateSentinel')"
  }

  // -------------------------------------------------- A16 type vote
  /** Dictionary membership predicates for the vote: the reference
    * resolves is_country via translate→pycountry lookup and is_city via
    * geonamescache (utils.py:852-877); offline both become membership
    * in the embedded fact dictionaries (en/fr names + ISO codes).
    */
  def isCountry(c: Column): Column = {
    val names = FactDictionaries.countries.flatMap { case (c2, c3, en, fr) =>
      Seq(c2, c3, en.toUpperCase, fr.toUpperCase) }.distinct
    upper(c).isin(names: _*)
  }

  def isCity(c: Column): Column = {
    val names = FactDictionaries.cities.flatMap { case (vf, ve, _) =>
      Seq(vf.toLowerCase, ve.toLowerCase) }.distinct
    lower(c).isin(names: _*)
  }

  /** The ten vote rates, keyed by the reference's type names. */
  def voteRates(v: Column): Seq[(String, Column)] = Seq(
    "numerique" -> isNumeric(v),
    "montant" -> isAmount(v),
    "date" -> isDate(v),
    "phone" -> isPhone(v),
    "email" -> isEmail(v),
    "civilite" -> isCivility(v),
    "pays" -> isCountry(v),
    "ville" -> isCity(v),
    "adresse" -> isAddress(v),
    "groupe_sanguin" -> isBloodGroup(v)
  ).map { case (k, p) => k -> p.cast("double") }

  /** Early-exit precedence of detect_columns_type (utils.py:1033-1092).
    * `civilite` is ABSENT: the reference's civilite branch tests
    * email_percentage (the utils.py:1065 bug), and since the email
    * branch has already continued when that is > 60, the civilite
    * early-exit is dead code. Replicated as-is (civilite can still win
    * the majority fallback, which is how the reference types civility
    * columns in practice).
    */
  val over60Precedence: Seq[String] = Seq(
    "numerique", "montant", "date", "phone", "email",
    "pays", "ville", "adresse", "groupe_sanguin")

  /** Tie-break order of the majority fallback = insertion order of the
    * rates dict (utils.py:1080-1091, sorted() is stable).
    */
  val majorityOrder: Seq[String] = Seq(
    "pays", "ville", "adresse", "email", "civilite",
    "phone", "numerique", "montant", "date", "groupe_sanguin")

  /** Sampled type-majority vote (A16): per-predicate pass rates over a
    * deterministic sample (first `sampleN` non-null rows by `idCol`;
    * the reference samples 20 with a fixed pandas seed — not
    * reproducible outside pandas, so the sample rule is ours and
    * documented), then the reference's decision procedure: first type
    * over 60% in precedence order, else the majority type > 50% with
    * the dict-order tie-break, else UNKNOWN.
    */
  def majorityTypeFull(df: DataFrame, valueCol: String, idCol: String,
                       sampleN: Int = 20): DataFrame = {
    val v = col(valueCol)
    val sampled = df.where(v.isNotNull).orderBy(col(idCol)).limit(sampleN)
    val rates = sampled.agg(
      voteRates(v).map { case (k, p) => avg(p).as(k) }.head,
      voteRates(v).map { case (k, p) => avg(p).as(k) }.tail: _*)
    val over60 = coalesce(over60Precedence.map(t => when(col(t) > 0.6, lit(t))): _*)
    val best = greatest(majorityOrder.map(col): _*)
    val majority = coalesce(majorityOrder.map(t =>
      when(col(t) === best && best > 0.5, lit(t))): _*)
    val winner = coalesce(over60, majority, lit("UNKNOWN"))
    rates.select(winner.as("detected_type") +:
      majorityOrder.map(t => round(col(t), 4).as(s"rate_$t")): _*)
  }

  /** Back-compat 4-type vote (the round-1 a16 query shape). */
  def majorityType(df: DataFrame, valueCol: String, idCol: String,
                   sampleN: Int = 20): DataFrame = {
    val v = col(valueCol)
    val sampled = df.where(v.isNotNull)
      .orderBy(col(idCol)).limit(sampleN)
    val rates = sampled.agg(
      avg(isNumeric(v).cast("double")).as("numerique"),
      avg(isEmail(v).cast("double")).as("email"),
      avg(isPhone(v).cast("double")).as("phone"),
      avg((classifyDateFormat(v) =!= UnknownDateLabel).cast("double")).as("date"))
    val precedence = Seq("numerique", "date", "phone", "email")
    val over60 = coalesce(precedence.map(t => when(col(t) > 0.6, lit(t))): _*)
    val best = greatest(precedence.map(col): _*)
    val majority = coalesce(precedence.map(t =>
      when(col(t) === best && best > 0.5, lit(t))): _*)
    val winner = coalesce(over60, majority, lit("UNKNOWN"))
    rates.select(winner.as("detected_type") +:
      precedence.map(t => round(col(t), 4).as(s"rate_$t")): _*)
  }

  /** DuckDB renderings of each vote predicate over column `expr` —
    * used by the a16b oracle so both sides share one registry.
    */
  def voteRateSql(expr: String): Seq[(String, String)] = {
    def m(re: String) = s"regexp_matches($expr, '${re.replace("'", "''")}')"
    val countryNames = FactDictionaries.countries
      .flatMap { case (c2, c3, en, fr) => Seq(c2, c3, en.toUpperCase, fr.toUpperCase) }
      .distinct.map(s => "'" + s.replace("'", "''") + "'").mkString(", ")
    val cityNames = FactDictionaries.cities
      .flatMap { case (vf, ve, _) => Seq(vf.toLowerCase, ve.toLowerCase) }
      .distinct.map(s => "'" + s.replace("'", "''") + "'").mkString(", ")
    Seq(
      "numerique" -> m(NumericTypeRe),
      "montant" -> s"regexp_matches(replace($expr, ' ', ''), '$AmountReSql')",
      "date" -> m(DateTypeRe),
      "phone" -> m(PhoneTypeRe),
      "email" -> m(EmailTypeRe),
      "civilite" -> m(CivilityRe),
      "pays" -> s"upper($expr) IN ($countryNames)",
      "ville" -> s"lower($expr) IN ($cityNames)",
      "adresse" -> m(AddressTypeRe),
      "groupe_sanguin" -> m(BloodGroupRe)
    )
  }
}
