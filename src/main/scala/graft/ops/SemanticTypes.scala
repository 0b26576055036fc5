package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic-type detection (SURVEY.md §2.2 F8/F12 + A16): regex
  * predicates from the reference's constraint registry
  * (db_configs/data_types.json, re-expressed in the common
  * Java/RE2-safe dialect), date-format classification, and the
  * sampled majority-vote column typing (utils.py:999-1106) as one
  * aggregation instead of a driver loop.
  */
object SemanticTypes {

  // predicates (data_types.json:128-162)
  val EmailTypeRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
  val PhoneTypeRe = "^\\+?[0-9.\\s-]{10,20}$"
  val NumericTypeRe = "^-?\\d*\\.?\\d+$"
  val BloodGroupRe = "^(A|B|AB|O)[+-]$"

  def isEmail(c: Column): Column = c.rlike(EmailTypeRe)
  def isPhone(c: Column): Column = c.rlike(PhoneTypeRe)
  def isNumeric(c: Column): Column = c.rlike(NumericTypeRe)
  def isBloodGroup(c: Column): Column = c.rlike(BloodGroupRe)

  /** Date-format classifier (F8, utils.py:1266-1289): first matching
    * pattern wins, else unknown. Subset of the reference's 12 labels —
    * the chained-when shape is the point.
    */
  val dateFormats: Seq[(String, String, String)] = Seq(
    // (label, detect regex, parse pattern)
    ("YYYY-MM-DD", "^\\d{4}-\\d{2}-\\d{2}$", "yyyy-MM-dd"),
    ("MM/DD/YYYY", "^\\d{2}/\\d{2}/\\d{4}$", "MM/dd/yyyy"),
    ("DD.MM.YYYY", "^\\d{2}\\.\\d{2}\\.\\d{4}$", "dd.MM.yyyy"),
    ("YYYYMMDD", "^\\d{8}$", "yyyyMMdd")
  )

  val UnknownDateLabel = "Format de date inconnu"

  def classifyDateFormat(c: Column): Column =
    dateFormats.foldRight(lit(UnknownDateLabel): Column) {
      case ((label, re, _), acc) => when(c.rlike(re), lit(label)).otherwise(acc)
    }

  /** Date reformat (C11, utils.py:1323-1348): try each format, output
    * MM-dd-yyyy, else the unknown sentinel.
    */
  def reformatDate(c: Column): Column = {
    val parsed = coalesce(
      dateFormats.map { case (_, _, p) => try_to_timestamp(c, lit(p)) }: _*)
    when(parsed.isNotNull, date_format(parsed, "MM-dd-yyyy"))
      .otherwise(lit(UnknownDateLabel + "."))
  }

  /** Sampled type-majority vote (A16): given a string column, compute
    * per-predicate pass rates over a deterministic "sample" (the first
    * `sampleN` rows by `idCol` — the reference samples 20 with a fixed
    * seed) and emit the winning type with the reference's precedence
    * order and 60% threshold, else majority > 50%, else UNKNOWN.
    */
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
    // first type > 60% in precedence order; else the max-rate type if
    // > 50%; else UNKNOWN (utils.py:1033-1106 determine_majority_type)
    val over60 = coalesce(precedence.map(t => when(col(t) > 0.6, lit(t))): _*)
    val best = greatest(precedence.map(col): _*)
    val majority = coalesce(precedence.map(t =>
      when(col(t) === best && best > 0.5, lit(t))): _*)
    val winner = coalesce(over60, majority, lit("UNKNOWN"))
    rates.select(winner.as("detected_type") +:
      precedence.map(t => round(col(t), 4).as(s"rate_$t")): _*)
  }
}
