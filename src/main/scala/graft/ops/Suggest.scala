package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.jaro_winkler

/** Dictionary-based anomaly detection + fuzzy correction suggestions —
  * the reference's base-de-faits machinery re-expressed as broadcast
  * joins.
  *
  * Reference semantics reproduced exactly:
  *  - anomaly = value whose UPPER() is not in the dictionary column's
  *    UPPER() set (GetAnomaliesBasedOn, functions.sql:1622-1634);
  *  - country suggestions score FIVE Jaro-Winkler channels — raw name,
  *    translated name (via the en↔fr lookup, translateCountryName,
  *    functions.sql:1639-1656), ISO 2-letter code, ISO 3-letter code,
  *    and specials-stripped name — keeping rows where any code/translated
  *    channel is exactly 1.0 or a name channel exceeds the threshold
  *    (GetAnomaliesSuggestionsForCountry, functions.sql:1665-1727);
  *  - generic suggestions score one channel vs an arbitrary fact column
  *    (GetAnomaliesSuggestions, functions.sql:1736-1779);
  *  - Jaro-Winkler is case-SENSITIVE (pg_similarity's jarowinkler).
  *
  * Scale shape: dictionaries are broadcast (≤ a few thousand rows);
  * the anomaly side is the DISTINCT violating values, not the corpus —
  * the crossJoin is |distinct anomalies| × |dict| scored map-side with
  * zero corpus shuffle. The reference's top-1 "first row per id_ligne
  * in score order" (fix_countries_errors, utils.py:1489-1504) has a
  * nondeterministic tie-break (cursor order); ours is documented and
  * deterministic: (score DESC, suggestion ASC).
  */
object Suggest {

  /** GetAnomaliesBasedOn: rows of `df` whose `valueCol` (UPPER) is
    * absent from the dictionary column (UPPER) — broadcast anti-join.
    * Null values are not anomalies here (the reference's IN/EXCEPT drops
    * NULLs); they are the VALEUR_NULL finding instead.
    */
  def anomaliesNotIn(df: DataFrame, valueCol: String,
                     facts: DataFrame, factCol: String): DataFrame =
    df.where(col(valueCol).isNotNull)
      .join(broadcast(facts.select(upper(col(factCol)).as("__fact_u")).distinct()),
        upper(col(valueCol)) === col("__fact_u"), "left_anti")

  private def stripSpecials(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9]+", "")

  /** translateCountryName(anomaly, 'fr'|'en'): the opposite-language
    * name whose UPPER matches, else '' (functions.sql:1639-1656).
    */
  private def withTranslation(anoms: DataFrame, dict: DataFrame,
                              langue: String): DataFrame = {
    val (from, to) =
      if (langue == "fr") ("nom_pays_en", "nom_pays_fr") else ("nom_pays_fr", "nom_pays_en")
    val lookup = dict
      .groupBy(upper(col(from)).as("__tr_key"))
      .agg(min(col(to)).as("__tr_val")) // LIMIT 1 analog, deterministic
    anoms.join(broadcast(lookup), upper(col("anomaly")) === col("__tr_key"), "left")
      .withColumn("__translated", coalesce(col("__tr_val"), lit("")))
      .drop("__tr_key", "__tr_val")
  }

  /** GetAnomaliesSuggestionsForCountry: all candidate rows above the
    * threshold on any channel, every channel score exposed.
    * `anoms` must have columns (id_ligne, anomaly).
    */
  def countrySuggestions(anoms: DataFrame, dict: DataFrame,
                         seuil: Double, langue: String = "fr"): DataFrame = {
    val nameCol = if (langue == "fr") "nom_pays_fr" else "nom_pays_en"
    val scored = withTranslation(anoms, dict, langue)
      .crossJoin(broadcast(dict))
      .select(
        col("id_ligne"), col("anomaly"),
        col(nameCol).as("suggest"), col("code_2l"), col("code_3l"),
        jaro_winkler(col(nameCol), col("anomaly")).as("jw_nom_pays"),
        jaro_winkler(col(nameCol), col("__translated")).as("jw_nom_pays_traduit"),
        jaro_winkler(col("code_2l"), col("anomaly")).as("jw_code_2l"),
        jaro_winkler(col("code_3l"), col("anomaly")).as("jw_code_3l"),
        jaro_winkler(col(nameCol), stripSpecials(col("anomaly"))).as("jw_sans_car_spec"))
    scored.where(
      col("jw_code_2l") === 1.0 || col("jw_code_3l") === 1.0 ||
        col("jw_nom_pays_traduit") === 1.0 ||
        col("jw_nom_pays") > seuil || col("jw_sans_car_spec") > seuil)
  }

  /** Top-1 country suggestion per id_ligne: ORDER BY greatest(channels)
    * DESC with the documented (suggest ASC) tie-break.
    */
  def countryTop1(anoms: DataFrame, dict: DataFrame,
                  seuil: Double, langue: String = "fr"): DataFrame = {
    val best = greatest(col("jw_nom_pays"), col("jw_nom_pays_traduit"),
      col("jw_code_2l"), col("jw_code_3l"), col("jw_sans_car_spec"))
    val w = Window.partitionBy(col("id_ligne"))
      .orderBy(best.desc, col("suggest").asc)
    countrySuggestions(anoms, dict, seuil, langue)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("id_ligne"), col("anomaly"), col("suggest"))
  }

  /** GetAnomaliesSuggestions: one JW channel vs a fact column. */
  def genericSuggestions(anoms: DataFrame, facts: DataFrame, factCol: String,
                         seuil: Double): DataFrame =
    anoms.crossJoin(broadcast(facts.select(col(factCol).as("suggest")).distinct()))
      .select(col("id_ligne"), col("anomaly"), col("suggest"),
        jaro_winkler(col("suggest"), col("anomaly")).as("jw"))
      .where(col("jw") > seuil)

  /** Top-1 generic suggestion per id_ligne, (jw DESC, suggest ASC). */
  def genericTop1(anoms: DataFrame, facts: DataFrame, factCol: String,
                  seuil: Double): DataFrame = {
    val w = Window.partitionBy(col("id_ligne"))
      .orderBy(col("jw").desc, col("suggest").asc)
    genericSuggestions(anoms, facts, factCol, seuil)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("id_ligne"), col("anomaly"), col("suggest"))
  }
}
