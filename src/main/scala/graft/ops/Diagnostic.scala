package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.facts.FactDictionaries
import graft.ops.ReferenceCorrections.ChainSpec

/** The reference's criteria lattice: `Critere.parametre_diagnostic ∈
  * {VAL_MANQ, VAL_MANQ_CONTRAINTS, VAL_MANQ_CONTRAINTS_FN,
  * VAL_MANQ_CONTRAINTS_FN_DUPLICATIONS, ALL}` selects a CUMULATIVE set
  * of diagnostic groups (models.py:67-88; dispatch api.py:360-484):
  *
  *   1 VAL_MANQ                 nulls / missing sentinels
  *   2 + CONTRAINTS             semantic-type constraint violations
  *   3 + FN                     1NF multi-token columns
  *   4 + DUPLICATIONS           duplicate rows (pandas duplicated)
  *   5 ALL                      + outliers, duplicate columns, general
  *                                string constraints (spaces, specials,
  *                                letter repetitions)
  *
  * Output is the DiagnosticDetail analog: one row per finding
  * (id_ligne, colonne, anomalie); column-level findings (1NF, duplicate
  * columns) carry id_ligne = 0. Row-level rules evaluate in ONE scan
  * (explode of a compacted when-array), not one pass per rule.
  */
object Diagnostic {

  sealed abstract class Level(val rank: Int, val name: String)
  case object ValManq extends Level(1, "VAL_MANQ")
  case object ValManqContraints extends Level(2, "VAL_MANQ_CONTRAINTS")
  case object ValManqContraintsFn extends Level(3, "VAL_MANQ_CONTRAINTS_FN")
  case object ValManqContraintsFnDup extends Level(4, "VAL_MANQ_CONTRAINTS_FN_DUPLICATIONS")
  case object All extends Level(5, "ALL")

  val levels: Seq[Level] =
    Seq(ValManq, ValManqContraints, ValManqContraintsFn, ValManqContraintsFnDup, All)

  private val MissingSentinels = ReferenceCorrections.MissingSentinels

  /** Reference general-constraint regexes (data_types.json:3-17). The
    * letter-repetition rule is `([a-zA-Z])\1{2,}` — a backreference the
    * oracle dialect (RE2) lacks, so [[repetitionReSql]] expands it to
    * the equivalent triple-letter alternation.
    */
  val SpacesRe = "\\s{2,}"
  val SpecialsRe = "[^a-zA-Z0-9\\s]"
  val RepetitionRe = "([a-zA-Z])\\1{2,}"
  val repetitionReSql: String =
    (('a' to 'z') ++ ('A' to 'Z')).map(c => s"$c$c$c").mkString("|")

  private def notInDict(c: Column, dict: Seq[String]): Column =
    c.isNotNull && !upper(c).isin(dict.map(_.toUpperCase).distinct: _*)

  /** Row-level rules per group, as (colonne, anomalie, predicate). */
  private def rowRules(spec: ChainSpec, level: Level): Seq[(String, String, Column)] = {
    val nulls = spec.types.map { case (cName, t) =>
      val c = col(cName)
      val pred =
        if (t == "integer") c.isNull
        else c.isNull || c.isin(MissingSentinels: _*)
      (cName, "VALEUR_NULL", pred)
    }
    val constraints = spec.types.flatMap { case (cName, t) =>
      val c = col(cName)
      t match {
        case "email" =>
          Some((cName, "EMAIL_INCORRECTE", c.isNotNull && SemanticTypes.emailViolation(c)))
        case "numerique" =>
          Some((cName, "VALEUR_NUMERIQUE_INCORRECTE",
            c.isNotNull && SemanticTypes.numericViolation(c)))
        case "phone" =>
          Some((cName, "FORMAT_NUMERO_TELEPHONE_INCORRECTE",
            c.isNotNull && !SemanticTypes.isPhone(c)))
        case "adresse" =>
          Some((cName, "FORMAT_ADRESSE_INCORRECTE",
            c.isNotNull && !SemanticTypes.isAddress(c)))
        case "date" =>
          Some((cName, "FORMAT_DATE_INCORRECTE", c.isNotNull &&
            SemanticTypes.reformatDate(c) === SemanticTypes.UnknownDateSentinel))
        case "pays" =>
          Some((cName, "PAYS_INCONNU_OU_MAL_ECRIT",
            notInDict(c, FactDictionaries.countries.map(_._4))))
        case "ville" =>
          Some((cName, "VILLE_INCONNU_OU_MAL_ECRIT",
            notInDict(c, FactDictionaries.cities.map(_._1))))
        case "civilite" =>
          Some((cName, "CIVILITE_INCONNU", notInDict(c, FactDictionaries.civilities)))
        case "groupe_sanguin" =>
          Some((cName, "GROUPE_SANGUIN_INCONNU",
            notInDict(c, FactDictionaries.bloodGroups)))
        case _ => None
      }
    }
    val general = spec.types.collect { case (cName, t) if t != "integer" =>
      val c = col(cName)
      Seq(
        (cName, "ESPACES_SUPERFLUS", c.isNotNull && c.rlike(SpacesRe)),
        (cName, "CARACTERES_SPECIAUX", c.isNotNull && c.rlike(SpecialsRe)),
        (cName, "REPETITIONS", c.isNotNull && c.rlike(RepetitionRe)))
    }.flatten
    nulls ++
      (if (level.rank >= 2) constraints else Nil) ++
      (if (level.rank >= 5) general else Nil)
  }

  /** All findings at `level` over `df`: (id_ligne, colonne, anomalie). */
  def findings(df: DataFrame, spec: ChainSpec, level: Level): DataFrame = {
    val id = col(spec.idCol)
    val rules = rowRules(spec, level)
    val structs = rules.map { case (cName, anom, pred) =>
      when(pred, struct(lit(cName).as("colonne"), lit(anom).as("anomalie")))
    }
    val rowLevel = df
      .select(id.as("id_ligne"), explode(array_compact(array(structs: _*))).as("f"))
      .select(col("id_ligne"), col("f.colonne"), col("f.anomalie"))

    val spark = df.sparkSession
    import spark.implicits._

    val dup =
      if (level.rank >= 4) {
        val w = Window.partitionBy(spec.types.map(t => col(t._1)): _*).orderBy(id)
        df.withColumn("__rn", row_number().over(w)).where(col("__rn") > 1)
          .select(id.as("id_ligne"), lit("Ne dépend pas de la colonne").as("colonne"),
            lit("DOUBLONS").as("anomalie"))
      } else spark.emptyDataset[(Long, String, String)]
        .toDF("id_ligne", "colonne", "anomalie")
        .select(col("id_ligne").cast(df.schema(spec.idCol).dataType),
          col("colonne"), col("anomalie"))

    val outliers =
      if (level.rank >= 5) {
        val intCols = spec.types.collect { case (c, "integer") => c }
        intCols.map { cName =>
          val stats = df.agg(
            // NOTE: built-in exact percentile (single aggregation buffer)
        // is fine here — this path mirrors the reference's interactive
        // per-table corrections; for corpus-scale columns use
        // graft.ops.Stats.exactPercentiles (distributed selection)
        percentile(col(cName), lit(0.25)).as("__q1"),
            percentile(col(cName), lit(0.75)).as("__q3"))
          val iqr = col("__q3") - col("__q1")
          df.crossJoin(broadcast(stats))
            .where(col(cName) < col("__q1") - iqr * 1.5 ||
              col(cName) > col("__q3") + iqr * 1.5)
            .select(id.as("id_ligne"), lit(cName).as("colonne"),
              lit("DETECTION_VALEUR_ABERANTE").as("anomalie"))
        }.reduceOption(_ unionByName _).getOrElse(dup.limit(0))
      } else dup.limit(0)

    // column-level findings (id_ligne = 0): 1NF multi-token gate and
    // duplicate-column pairs — profile-time driver stats like the
    // reference (utils.py:651-659, functions.sql:1423-1447)
    val colLevel = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    if (level.rank >= 3) {
      // all per-column gates in ONE aggregation pass (avg ignores the
      // nulls the per-column WHERE would have filtered)
      val strCols = spec.types.collect { case (c, t) if t != "integer" => c }
      val aggs = strCols.flatMap { c => Seq(
        avg(when(col(c).isNotNull, col(c).contains(" ").cast("double"))).as(s"__sr_$c"),
        avg(when(col(c).isNotNull, size(split(col(c), " ")).cast("double"))).as(s"__at_$c"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      strCols.foreach { c =>
        val srI = row.fieldIndex(s"__sr_$c")
        val atI = row.fieldIndex(s"__at_$c")
        if (!row.isNullAt(srI) && row.getDouble(srI) > 0.5 && row.getDouble(atI) <= 3.0)
          colLevel += ((c, "NON_1FN_MULTITOKEN"))
      }
    }
    if (level.rank >= 5) {
      val strCols = spec.types.collect { case (c, t) if t != "integer" => c }
      Corrections.duplicateColumnPairs(df, strCols).foreach { case (a, b) =>
        colLevel += ((s"$a/$b", "COLONNES_DUPLIQUEES"))
      }
    }
    val colLevelDf = spark.createDataset(colLevel.toSeq)
      .toDF("colonne", "anomalie")
      .select(lit(0).cast(df.schema(spec.idCol).dataType).as("id_ligne"),
        col("colonne"), col("anomalie"))

    rowLevel.unionByName(dup).unionByName(outliers).unionByName(colLevelDf)
  }

  /** Per-level finding counts — the lattice summary. */
  def levelCounts(df: DataFrame, spec: ChainSpec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = levels.map(l => (l.rank, l.name, findings(df, spec, l).count()))
    spark.createDataset(rows).toDF("lvl", "parametre", "n_findings")
      .orderBy(col("lvl"))
  }
}
