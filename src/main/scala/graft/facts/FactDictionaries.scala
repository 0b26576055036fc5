package graft.facts

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference fact dictionaries (bases de faits), embedded as broadcast
  * lookup tables.
  *
  * The reference ships these as PostgreSQL tables seeded by
  * `db_configs/base_faits.sql`: `bf_pays_continent` (~240 countries with
  * fr/en names + ISO 2L/3L codes, lines 4-13 for the schema),
  * `bf_ville` (~1.9k cities, lines 284-289), `bf_groupe_sanguin`
  * (12 rows, lines 2644-2665), `bf_civilite` (8 rows, lines 2669-2683).
  * A representative subset of the country/city rows (public ISO-3166 /
  * geographic facts) is embedded here — enough to cover every value the
  * CLIENTS correctness fixture and the suggestion-join tests exercise;
  * at deployment the full tables load from config exactly like any
  * other broadcast dictionary.
  *
  * Each dictionary also renders itself as a DuckDB VALUES clause so the
  * driver's oracle SQL scores against the SAME rows — one source of
  * truth, no drift.
  */
object FactDictionaries {

  /** (code_2l, code_3l, nom_pays_en, nom_pays_fr) — base_faits.sql:4-13,17+. */
  val countries: Seq[(String, String, String, String)] = Seq(
    ("DZ", "DZA", "Algeria", "Algérie"),
    ("AR", "ARG", "Argentina", "Argentine"),
    ("AU", "AUS", "Australia", "Australie"),
    ("AT", "AUT", "Austria", "Autriche"),
    ("BE", "BEL", "Belgium", "Belgique"),
    ("BR", "BRA", "Brazil", "Brésil"),
    ("CM", "CMR", "Cameroon", "Cameroun"),
    ("CA", "CAN", "Canada", "Canada"),
    ("TD", "TCD", "Chad", "Tchad"),
    ("CL", "CHL", "Chile", "Chili"),
    ("CN", "CHN", "China", "Chine"),
    ("CO", "COL", "Colombia", "Colombie"),
    ("CD", "COD", "Congo, Democratic Republic of the", "Congo, République Démocratique du"),
    ("CZ", "CZE", "Czech Republic", "République Tchèque"),
    ("DK", "DNK", "Denmark", "Danemark"),
    ("ET", "ETH", "Ethiopia", "Éthiopie"),
    ("FI", "FIN", "Finland", "Finlande"),
    ("FR", "FRA", "France", "France"),
    ("GA", "GAB", "Gabon", "Gabon"),
    ("DE", "DEU", "Germany", "Allemagne"),
    ("GH", "GHA", "Ghana", "Ghana"),
    ("GR", "GRC", "Greece", "Grèce"),
    ("HU", "HUN", "Hungary", "Hongrie"),
    ("IN", "IND", "India", "Inde"),
    ("IQ", "IRQ", "Iraq", "Irak"),
    ("ID", "IDN", "Indonesia", "Indonésie"),
    ("IE", "IRL", "Ireland", "Irlande"),
    ("IL", "ISR", "Israel", "Israël"),
    ("IT", "ITA", "Italy", "Italie"),
    ("CI", "CIV", "Côte d'Ivoire", "Côte d'Ivoire"),
    ("JP", "JPN", "Japan", "Japon"),
    ("KE", "KEN", "Kenya", "Kenya"),
    ("KR", "KOR", "Korea, Republic of", "Corée, République de"),
    ("LB", "LBN", "Lebanon", "Liban"),
    ("ML", "MLI", "Mali", "Mali"),
    ("MX", "MEX", "Mexico", "Mexique"),
    ("MA", "MAR", "Morocco", "Maroc"),
    ("NL", "NLD", "Netherlands", "Pays-Bas"),
    ("NZ", "NZL", "New Zealand", "Nouvelle-Zélande"),
    ("NE", "NER", "Niger", "Niger"),
    ("NG", "NGA", "Nigeria", "Nigéria"),
    ("NO", "NOR", "Norway", "Norvège"),
    ("PE", "PER", "Peru", "Pérou"),
    ("PH", "PHL", "Philippines", "Philippines"),
    ("PL", "POL", "Poland", "Pologne"),
    ("PT", "PRT", "Portugal", "Portugal"),
    ("QA", "QAT", "Qatar", "Qatar"),
    ("RO", "ROU", "Romania", "Roumanie"),
    ("RU", "RUS", "Russian Federation", "Fédération de Russie"),
    ("SA", "SAU", "Saudi Arabia", "Arabie Saoudite"),
    ("SN", "SEN", "Senegal", "Sénégal"),
    ("VN", "VNM", "Viet Nam", "Viet Nam"),
    ("ZA", "ZAF", "South Africa", "Afrique du Sud"),
    ("ES", "ESP", "Spain", "Espagne"),
    ("SE", "SWE", "Sweden", "Suède"),
    ("CH", "CHE", "Switzerland", "Suisse"),
    ("TH", "THA", "Thailand", "Thaïlande"),
    ("AE", "ARE", "United Arab Emirates", "Émirats Arabes Unis"),
    ("TN", "TUN", "Tunisia", "Tunisie"),
    ("TR", "TUR", "Turkey", "Turquie"),
    ("UA", "UKR", "Ukraine", "Ukraine"),
    ("EG", "EGY", "Egypt", "Égypte"),
    ("GB", "GBR", "United Kingdom", "Royaume-Uni"),
    ("US", "USA", "United States", "États-Unis"),
    ("BF", "BFA", "Burkina Faso", "Burkina Faso")
  )

  /** (nom_ville_fr, nom_ville_en, nom_pays_fr) — base_faits.sql:284-289+. */
  val cities: Seq[(String, String, String)] = Seq(
    ("Hyères", "Hyères", "France"),
    ("Mantes-la-Jolie", "Mantes-la-Jolie", "France"),
    ("Châtellerault", "Châtellerault", "France"),
    ("Quimper", "Quimper", "France"),
    ("Vitrolles", "Vitrolles", "France"),
    ("Angoulême", "Angouleme", "France"),
    ("Chambéry", "Chambery", "France"),
    ("Montélimar", "Montélimar", "France"),
    ("Tarbes", "Tarbes", "France"),
    ("Arles", "Arles", "France"),
    ("Charleville-Mézières", "Charleville-Mezieres", "France"),
    ("Beauvais", "Beauvais", "France"),
    ("Laval", "Laval", "France"),
    ("Carcassonne", "Carcassonne", "France"),
    ("Auxerre", "Auxerre", "France"),
    ("Brive-la-Gaillarde", "Brive-la-Gaillarde", "France"),
    ("Mâcon", "Mâcon", "France"),
    ("Châlons-en-Champagne", "Châlons-en-Champagne", "France"),
    ("Valenciennes", "Valenciennes", "France"),
    ("Bastia", "Bastia", "France"),
    ("Albi", "Albi", "France"),
    ("Ajaccio", "Ajaccio", "France"),
    ("Maubeuge", "Maubeuge", "France"),
    ("Épinal", "Épinal", "France"),
    ("Épinay sur seine", "Epinay sur seine", "France"),
    ("Forbach", "Forbach", "France"),
    ("Savigny-sur-Orge", "Savigny-sur-Orge", "France"),
    ("Chalon-sur-Saône", "Chalon-sur-Saône", "France"),
    ("Sevran", "Sevran", "France"),
    ("Vierzon", "Vierzon", "France"),
    ("Choisy-le-Roi", "Choisy-le-Roi", "France"),
    ("Marseille", "Marseille", "France"),
    ("Lyon", "Lyon", "France"),
    ("Paris", "Paris", "France"),
    ("Nice", "Nice", "France"),
    ("Nantes", "Nantes", "France"),
    ("Strasbourg", "Strasbourg", "France"),
    ("Montpellier", "Montpellier", "France"),
    ("Bordeaux", "Bordeaux", "France"),
    ("Lille", "Lille", "France"),
    ("Rennes", "Rennes", "France"),
    ("Reims", "Reims", "France"),
    ("Le Havre", "Le Havre", "France"),
    ("Saint-Étienne", "Saint-Etienne", "France"),
    ("Toulon", "Toulon", "France"),
    ("Grenoble", "Grenoble", "France"),
    ("Dijon", "Dijon", "France"),
    ("Angers", "Angers", "France"),
    ("Villeurbanne", "Villeurbanne", "France"),
    ("Le Mans", "Le Mans", "France"),
    ("Aix-en-Provence", "Aix-en-Provence", "France"),
    ("Brest", "Brest", "France"),
    ("Nîmes", "Nîmes", "France"),
    ("Clermont-Ferrand", "Clermont-Ferrand", "France"),
    ("Limoges", "Limoges", "France"),
    ("Avignon", "Avignon", "France"),
    ("Saint-Denis", "Saint-Denis", "France"),
    ("Argenteuil", "Argenteuil", "France"),
    ("Rouen", "Rouen", "France"),
    ("Saint-Paul", "Saint-Paul", "France"),
    ("Dunkerque", "Dunkerque", "France"),
    ("Vitry-sur-Seine", "Vitry-sur-Seine", "France"),
    ("Créteil", "Créteil", "France"),
    ("Pau", "Pau", "France"),
    ("Poitiers", "Poitiers", "France"),
    ("Perpignan", "Perpignan", "France"),
    ("Metz", "Metz", "France"),
    ("Béthune", "Béthune", "France"),
    ("Orléans", "Orléans", "France"),
    ("Mulhouse", "Mulhouse", "France"),
    ("Madrid", "Madrid", "Espagne"),
    ("Barcelone", "Barcelona", "Espagne"),
    ("Valence", "Valencia", "Espagne"),
    ("Séville", "Seville", "Espagne"),
    ("Saragosse", "Zaragoza", "Espagne"),
    ("Málaga", "Málaga", "Espagne"),
    ("Murcie", "Murcia", "Espagne"),
    ("Palma", "Palma", "Espagne"),
    ("Las Palmas", "Las Palmas", "Espagne"),
    ("Bilbao", "Bilbao", "Espagne"),
    ("Londres", "London", "Royaume-Uni"),
    ("Birmingham", "Birmingham", "Royaume-Uni"),
    ("Manchester", "Manchester", "Royaume-Uni"),
    ("Glasgow", "Glasgow", "Royaume-Uni"),
    ("Liverpool", "Liverpool", "Royaume-Uni"),
    ("Bristol", "Bristol", "Royaume-Uni"),
    ("Sheffield", "Sheffield", "Royaume-Uni"),
    ("Leeds", "Leeds", "Royaume-Uni"),
    ("Édimbourg", "Edinburgh", "Royaume-Uni"),
    ("Leicester", "Leicester", "Royaume-Uni"),
    ("Berlin", "Berlin", "Allemagne"),
    ("Hambourg", "Hamburg", "Allemagne"),
    ("Munich", "Munich", "Allemagne"),
    ("Cologne", "Cologne", "Allemagne"),
    ("Francfort", "Frankfurt", "Allemagne"),
    ("Stuttgart", "Stuttgart", "Allemagne"),
    ("Düsseldorf", "Düsseldorf", "Allemagne"),
    ("Dortmund", "Dortmund", "Allemagne"),
    ("Essen", "Essen", "Allemagne"),
    ("Leipzig", "Leipzig", "Allemagne")
  )

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
