package graft.facts

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference fact dictionaries (bases de faits), embedded as broadcast
  * lookup tables.
  *
  * The reference ships these as PostgreSQL tables seeded by
  * `db_configs/base_faits.sql`: `bf_pays_continent` (242 countries with
  * fr/en names + ISO 2L/3L codes, lines 4-13 for the schema),
  * `bf_ville` (1892 cities, lines 284-289), `bf_groupe_sanguin`
  * (12 rows, lines 2644-2665), `bf_civilite` (8 rows, lines 2669-2683).
  * The country/city rows are the COMPLETE tables (public ISO-3166 /
  * geographic facts), generated into [[CountryFacts]]/[[CityFacts]]
  * from the reference SQL — a suggestion whose true nearest neighbor
  * is anywhere in the reference's dictionary now matches the reference.
  *
  * Each dictionary also renders itself as a DuckDB VALUES clause so the
  * driver's oracle SQL scores against the SAME rows — one source of
  * truth, no drift.
  */
object FactDictionaries {

  /** (code_2l, code_3l, nom_pays_en, nom_pays_fr) — base_faits.sql:17-259, complete. */
  val countries: Seq[(String, String, String, String)] = CountryFacts.rows

  /** (nom_ville_fr, nom_ville_en, nom_pays_fr) — base_faits.sql:295-2640, complete. */
  val cities: Seq[(String, String, String)] = CityFacts.rows

  /** base_faits.sql:2644-2665. */
  val bloodGroups: Seq[String] =
    Seq("A", "A+", "A-", "B", "B+", "B-", "AB", "AB+", "AB-", "O", "O+", "O-")

  /** base_faits.sql:2669-2683. */
  val civilities: Seq[String] =
    Seq("Mr", "Mme", "Mlle", "Dr", "Pr", "Monsieur", "Madame", "Mademoiselle")

  def countriesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    countries.toDF("code_2l", "code_3l", "nom_pays_en", "nom_pays_fr")
  }

  def citiesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cities.toDF("nom_ville_fr", "nom_ville_en", "nom_pays_fr")
  }

  def bloodGroupsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    bloodGroups.toDF("groupe")
  }

  def civilitiesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    civilities.toDF("civilite")
  }

  // ---------------------------------------------- DuckDB oracle views

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(VALUES ...) AS bf_pays_continent(code_2l, code_3l, nom_pays_en, nom_pays_fr)` */
  def countriesSql: String =
    countries.map { case (c2, c3, en, fr) =>
      s"(${q(c2)}, ${q(c3)}, ${q(en)}, ${q(fr)})"
    }.mkString(
      "(VALUES ", ", ", ") AS bf_pays_continent(code_2l, code_3l, nom_pays_en, nom_pays_fr)")

  def citiesSql: String =
    cities.map { case (vf, ve, pf) => s"(${q(vf)}, ${q(ve)}, ${q(pf)})" }
      .mkString("(VALUES ", ", ", ") AS bf_ville(nom_ville_fr, nom_ville_en, nom_pays_fr)")

  def civilitiesSql: String =
    civilities.map(c => s"(${q(c)})")
      .mkString("(VALUES ", ", ", ") AS bf_civilite(civilite)")

  def bloodGroupsSql: String =
    bloodGroups.map(g => s"(${q(g)})")
      .mkString("(VALUES ", ", ", ") AS bf_groupe_sanguin(groupe)")
}
