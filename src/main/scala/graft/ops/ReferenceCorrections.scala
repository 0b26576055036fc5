package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.facts.FactDictionaries

/** The reference's COMPOSED correction pipeline in its fixed order
  * (api.py:812-906): snapshot → nulls → outliers→mean → spaces →
  * duplicate rows → special chars → emails → countries → cities →
  * civilities → blood groups → numerics → init-cap of UNKNOWN columns —
  * over a tabular frame, as chained projections + broadcast suggestion
  * joins instead of one UPDATE per cell.
  *
  * Documented divergences from the reference's row-cursor semantics
  * (each is where the reference's own result depends on DB cursor order
  * and is not reproducible even against itself):
  *  - outlier→mean replaces ALL outliers with the mean computed once
  *    over the pre-replacement column; the reference recomputes
  *    AVG(col) after each row UPDATE in cursor order
  *    (utils.py:1451-1455), so its result depends on row order.
  *  - top-1 suggestion ties break deterministically
  *    (score DESC, suggestion ASC); the reference takes the first
  *    cursor row (utils.py:1497-1502).
  *  - the spaces step only TRIMs (the reference computes the
  *    collapse-internal-spaces value and then discards it,
  *    utils.py:1458-1462 — quirk preserved: internal runs survive).
  */
object ReferenceCorrections {

  /** Column semantic types: unknown | civilite | ville | pays | email |
    * phone | numerique | date | adresse | groupe_sanguin | integer.
    * `integer` marks native numeric columns (outlier step); all others
    * are string columns.
    */
  final case class ChainSpec(idCol: String, types: Seq[(String, String)])

  /** The missing-value sentinel list (functions.sql:1541-1544) — the
    * single source is RuleConfig.Sentinels.
    */
  val MissingSentinels: Seq[String] =
    graft.rules.RuleConfig.Sentinels.toSeq.sorted

  /** VALEUR_NULL correction targets: the missing sentinels plus the
    * correction's own IN-list (utils.py:1446-1449).
    */
  val NullSentinels: Seq[String] = MissingSentinels ++ Seq(" -", "- ")

  private def stringCols(spec: ChainSpec): Seq[String] =
    spec.types.collect { case (c, t) if t != "integer" => c }

  private def colsOf(spec: ChainSpec, t: String): Seq[String] =
    spec.types.collect { case (c, tt) if tt == t => c }

  private def withEach(df: DataFrame, cols: Seq[String])(f: Column => Column): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, f(col(c))))

  private def notInDict(c: Column, dict: Seq[String]): Column =
    c.isNotNull && !upper(c).isin(dict.map(_.toUpperCase).distinct: _*)

  /** Shared shape of the country/city/civility/blood-group fix: trim the
    * anomalous rows, apply the top-1 suggestion, then homogenize case.
    */
  private def fixBasedOn(df: DataFrame, colName: String, idCol: String,
                         dictValues: Seq[String],
                         top1: DataFrame => DataFrame,
                         homogenize: Column => Column): DataFrame = {
    val anomalous = notInDict(col(colName), dictValues)
    val trimmed = df.withColumn(colName, when(anomalous, trim(col(colName)))
      .otherwise(col(colName)))
    val anoms = trimmed
      .where(notInDict(col(colName), dictValues))
      .select(col(idCol).as("id_ligne"), col(colName).as("anomaly"))
    val sugg = top1(anoms).select(col("id_ligne").as(idCol), col("suggest"))
    trimmed.join(broadcast(sugg), Seq(idCol), "left")
      .withColumn(colName,
        homogenize(when(col("suggest").isNotNull, col("suggest")).otherwise(col(colName))))
      .drop("suggest")
  }

  def applyChain(input: DataFrame, spec: ChainSpec,
                 countries: DataFrame, cities: DataFrame,
                 civilities: DataFrame, bloodGroups: DataFrame,
                 seuil: Double = 0.85): DataFrame = {
    val id = spec.idCol
    val allCols = id +: spec.types.map(_._1)

    // DOUBLONS are diagnosed on the ORIGINAL frame (pandas
    // duplicated() over all non-id columns, keep-first in id order —
    // utils.py:368-382); the flagged ids are deleted at the dedup step.
    val wDup = Window.partitionBy(spec.types.map(t => col(t._1)): _*).orderBy(col(id))
    val flagged = input.withColumn("__dup", row_number().over(wDup) > 1)

    // 1. VALEUR_NULL
    val s1 = withEach(flagged, stringCols(spec))(c =>
      when(c.isin(NullSentinels: _*), lit(null)).otherwise(c))

    // 2. DETECTION_VALEUR_ABERANTE → mean (IQR method, utils.py:1131-1154;
    // integer target column rounds the numeric mean like the reference's
    // UPDATE-with-AVG cast)
    val s2 = colsOf(spec, "integer").foldLeft(s1) { (d, cName) =>
      val stats = d.agg(
        // NOTE: built-in exact percentile (single aggregation buffer)
        // is fine here — this path mirrors the reference's interactive
        // per-table corrections; for corpus-scale columns use
        // graft.ops.Stats.exactPercentiles (distributed selection)
        percentile(col(cName), lit(0.25)).as("__q1"),
        percentile(col(cName), lit(0.75)).as("__q3"),
        avg(col(cName)).as("__mean"))
      val joined = d.crossJoin(broadcast(stats))
      val iqr = col("__q3") - col("__q1")
      val outlier = col(cName) < col("__q1") - iqr * 1.5 ||
        col(cName) > col("__q3") + iqr * 1.5
      joined.withColumn(cName,
        when(outlier, round(col("__mean"), 0).cast("int")).otherwise(col(cName)))
        .drop("__q1", "__q3", "__mean")
    }

    // 3. ESPACES_SUPERFLUS: trim the rows flagged by the \s{2,} scan
    val s3 = withEach(s2, stringCols(spec))(c =>
      when(c.rlike("\\s{2,}"), trim(c)).otherwise(c))

    // 4. DOUBLONS: delete the 2nd+ rows of original-frame duplicates
    val s4 = s3.where(!col("__dup")).drop("__dup")

    // 5. CARACTERES_SPECIAUX: strip on flagged rows of UNKNOWN columns
    val s5 = withEach(s4, colsOf(spec, "unknown"))(c =>
      when(c.rlike("[^a-zA-Z0-9\\s]"), regexp_replace(c, "[^A-Za-z0-9]+", ""))
        .otherwise(c))

    // 6. EMAIL_INCORRECTE → NULL (TLD whitelist), then lowercase column
    val s6 = withEach(s5, colsOf(spec, "email"))(c =>
      lower(when(c.isNotNull && SemanticTypes.emailViolation(c), lit(null)).otherwise(c)))

    // 7. PAYS_INCONNU_OU_MAL_ECRIT: trim anomalies → 5-channel top-1 →
    // UPPER column
    val frNames = FactDictionaries.countries.map(_._4)
    val s7 = colsOf(spec, "pays").foldLeft(s6) { (d, cName) =>
      fixBasedOn(d, cName, id, frNames,
        anoms => Suggest.countryTop1(anoms, countries, seuil, "fr"),
        upper)
    }

    // 8. VILLE_INCONNU_OU_MAL_ECRIT: generic top-1 vs bf_ville →
    // capitalize column
    val villeNames = FactDictionaries.cities.map(_._1)
    val s8 = colsOf(spec, "ville").foldLeft(s7) { (d, cName) =>
      fixBasedOn(d, cName, id, villeNames,
        anoms => Suggest.genericTop1(anoms, cities, "nom_ville_fr", seuil),
        Corrections.capitalize)
    }

    // 9. CIVILITE_INCONNU: generic top-1 vs bf_civilite → capitalize
    val s9 = colsOf(spec, "civilite").foldLeft(s8) { (d, cName) =>
      fixBasedOn(d, cName, id, FactDictionaries.civilities,
        anoms => Suggest.genericTop1(anoms, civilities, "civilite", seuil),
        Corrections.capitalize)
    }

    // 10. GROUPE_SANGUIN_INCONNU: generic top-1 vs bf_groupe_sanguin →
    // UPPER
    val s10 = colsOf(spec, "groupe_sanguin").foldLeft(s9) { (d, cName) =>
      fixBasedOn(d, cName, id, FactDictionaries.bloodGroups,
        anoms => Suggest.genericTop1(anoms, bloodGroups, "groupe", seuil),
        upper)
    }

    // 11. VALEUR_NUMERIQUE_INCORRECTE → NULL
    val s11 = withEach(s10, colsOf(spec, "numerique"))(c =>
      when(c.isNotNull && SemanticTypes.numericViolation(c), lit(null)).otherwise(c))

    // 12. UNKNOWN-type homogenization: capitalize
    val s12 = withEach(s11, colsOf(spec, "unknown"))(Corrections.capitalize)

    s12.select(allCols.map(col): _*).orderBy(col(id))
  }

  // ---------------------------------------------------- quality score


  /** Per-column anomaly predicate for the score: the semantic-type
    * violation matching the column's detected type. `date`, `unknown`
    * and `integer` columns contribute no type anomalies (the reference
    * skips native integer/date columns in check_constraints and has no
    * semantic rule for UNKNOWN); `adresse` uses the FIXED word-boundary
    * regex (see SemanticTypes.AddressTypeRe).
    */
  private def anomalyFlag(c: Column, t: String): Column = t match {
    case "email" => c.isNotNull && SemanticTypes.emailViolation(c)
    case "numerique" => c.isNotNull && SemanticTypes.numericViolation(c)
    case "phone" => c.isNotNull && !SemanticTypes.isPhone(c)
    case "adresse" => c.isNotNull && !SemanticTypes.isAddress(c)
    case "pays" => notInDict(c, FactDictionaries.countries.map(_._4))
    case "ville" => notInDict(c, FactDictionaries.cities.map(_._1))
    case "civilite" => notInDict(c, FactDictionaries.civilities)
    case "groupe_sanguin" => notInDict(c, FactDictionaries.bloodGroups)
    case _ => lit(false)
  }

  /** A14, the reference's EXACT formula (utils.py:491-509):
    * score = Σ_cols (missing + outliers + anomalies) / n_values,
    * then score · 100 / (ncols − 1), stored as 100 − score.
    * Components per column: missing = NULL or missing-sentinel count;
    * outliers = IQR outlier count on integer columns (utils.py:1131-1154);
    * anomalies = the column's semantic-type violations (documented in
    * [[anomalyFlag]]). n_values = the table's row count for every
    * column (meta_colonne.nombre_valeurs = nombre_lignes,
    * utils.py:196-197); ncols counts every column including the
    * synthetic id (which contributes zero).
    */
  def referenceScore(df: DataFrame, spec: ChainSpec): DataFrame = {
    val intCols = colsOf(spec, "integer")
    val statsAggs = intCols.flatMap(c => Seq(
      percentile(col(c), lit(0.25)).as(s"__q1_$c"),
      percentile(col(c), lit(0.75)).as(s"__q3_$c")))
    val joined =
      if (intCols.isEmpty) df
      else df.crossJoin(broadcast(df.agg(statsAggs.head, statsAggs.tail: _*)))

    val perColumn: Seq[Column] = spec.types.map { case (cName, t) =>
      val c = col(cName)
      val missing =
        if (t == "integer") sum(c.isNull.cast("long"))
        else sum((c.isNull || c.isin(MissingSentinels: _*)).cast("long"))
      val outliers =
        if (t == "integer") {
          val iqr = col(s"__q3_$cName") - col(s"__q1_$cName")
          sum((c < col(s"__q1_$cName") - iqr * 1.5 ||
            c > col(s"__q3_$cName") + iqr * 1.5).cast("long"))
        } else lit(0L)
      val anomalies = sum(anomalyFlag(c, t).cast("long"))
      (missing + outliers + anomalies).as(s"__bad_$cName")
    }
    val aggs = perColumn :+ count(lit(1)).as("__n")
    val agged = joined.agg(aggs.head, aggs.tail: _*)
    val ncols = spec.types.size + 1 // + the synthetic id column
    val ratioSum = spec.types.map { case (cName, _) =>
      col(s"__bad_$cName").cast("double") / col("__n")
    }.reduce(_ + _)
    agged.select(
      round(lit(100.0) - ratioSum * 100.0 / (ncols - 1), 4).as("score"))
  }
}
