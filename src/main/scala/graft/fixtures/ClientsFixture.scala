package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's correctness corpus: the 41-row dirty CLIENTS table
  * (db_configs/test_data.sql:4-30 schema, :33-158 rows), embedded with a
  * synthetic `clients_id` primary key exactly like the reference's
  * ingestion adds a `{table}_id` SERIAL (utils.py:118-123; row order =
  * file order). Every anomaly class the reference diagnoses is present:
  * missing sentinels, IQR outliers in CATCLI, superfluous spaces,
  * special characters, malformed emails, misspelled countries/cities/
  * civilities, mixed case, mixed date formats.
  *
  * Like the fact dictionaries, the fixture renders itself as a DuckDB
  * VALUES clause so oracle SQL runs over byte-identical rows.
  */
object ClientsFixture {

  final case class Client(
      clients_id: Int, codcli: String, civcli: Option[String], nomcli: String,
      prencli: String, catcli: Option[Int], adncli: Option[String],
      adrcli: Option[String], cpcli: Option[String], vilcli: Option[String],
      payscli: Option[String], mailcli: Option[String], telcli: Option[String],
      datnaiscli: Option[String], dpremcontactcli: Option[String],
      obscli: Option[String], remcli: Option[String], genrecli: Option[String])

  val rows: Seq[Client] = Seq(
    Client(1, "C001", Some("Madame"), "CLEM@ENT", "EVE", Some(1), Some("18"), Some("BOULEVARD FOCH"), Some("91000"), Some("EPINAY-SUR-ORGE"), Some("FRANCE"), Some("eve.clement@gmail.com"), Some("+33777889911"), Some("17-06-1951"), Some("12-12-2012"), Some(""), Some(""), Some("F")),
    Client(2, "C002", Some("Madame"), "LESEUL", "M@RIE", Some(1), Some("17"), Some("AVENUE D ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("marieleseul@yahoo.fr"), Some("0617586565"), Some("05-08-1983"), Some("05-08-1983"), Some(""), Some(""), Some("F")),
    Client(3, "C003", Some("Madame"), "UNIQUE", "Inès", Some(2), Some("77"), Some("RUE DE LA LIBERTE"), Some("13001"), Some("MARCHEILLLE"), Some("FRANCE"), Some("munique@gmail.com"), Some("+33717889922"), Some("22-11-1969"), Some("12-12-2012"), Some(""), Some(""), Some("F")),
    Client(4, "C004", Some("Madame"), "CLEMENCE", "EVELYNE", Some(4), Some("8 BIS"), Some("FOCH"), Some("93800"), Some("EPINAY-SUR-SEINE"), Some("FRANCE"), Some("clemence evelyne@gmail.com"), Some("+33777889933"), None, None, Some(""), Some(""), Some("F")),
    Client(5, "C005", Some("Madam"), "FORT", "anne marie", Some(3), Some("55"), Some("RUE DU JAPON"), Some("94310"), Some("ORLY-VILLE"), Some("FRANCE"), Some("jfort\\@hotmail.fr"), Some("+33777889944"), Some("11-11-2000"), None, Some(""), Some(""), Some("F")),
    Client(6, "C006", Some("Mademoisele"), "LE BON", "Clémence", Some(1), Some("18"), Some("BOULEVARD FOCH"), Some("93800"), Some("EPINAY-SUR-SEINE"), Some("FRANCE"), Some("clemence.le bon@cfo.fr"), Some("0033777889955"), Some("16-10-1996"), Some("18-10-2018"), Some(""), Some(""), Some("F")),
    Client(7, "C007", Some("Mademoiselle"), "TRAIFOR", "Alice", Some(2), Some("6"), Some("DE LA ROSIERE"), Some("75015"), Some("PARIS"), Some("FRANCE"), Some("alice.traifor@yahoo.fr"), Some("+33777889966"), Some("23-02-1998"), None, Some(""), Some(""), Some("F")),
    Client(8, "C008", Some("Monsieur"), "VIVANT", "JEAN-BAPTISTE", Some(1), Some("13"), Some("RUE DE LA PAIX"), Some("93800"), Some("EPINAY-SUR-SEINE"), Some("FRANCE"), Some("jeanbaptiste@"), Some("0607"), Some("17-09-1958"), Some("17-09-2000"), Some(""), Some(""), Some("F")),
    Client(9, "C009", Some("Monsieur"), "CLEMENCE", "Alexandre", Some(1), Some("5"), Some("Rue De Belleville"), Some("75019"), Some("PARIS"), None, Some("alexandre.clemence@up13.fr"), Some("+33149404071"), Some("19-09-1999"), Some("20-10-2020"), Some(""), Some(""), Some("F")),
    Client(10, "C010", Some("Monsieur"), "TRAIFOR", "Alexandre", Some(1), Some("17"), Some("AVENUE FOCH"), Some("75016"), Some("PARIS"), Some("FRA"), Some("alexandre.traifor@up13.fr"), Some("06070809"), Some("17-07-1967"), Some("17-09-2000"), Some(""), Some(""), Some("F")),
    Client(11, "C011", Some("Monsiieur"), "PREMIER", "JOS//EPH", Some(2), Some("77//"), Some("RUE// DE LA LIBERTE"), Some("13001"), Some("MARCHEILLE"), Some("FRANCE"), Some("josef@premier"), Some("+33777889977"), Some("01-01-2000"), Some("20-10-2020"), Some(""), Some(""), Some("F")),
    Client(12, "C012", Some("Monsieur"), "CLEMENT", "Adam", Some(2), Some("13"), Some("AVENUE JEAN BAPTISTE CLEMENT"), Some("9430"), Some("VILLETANEUSE"), Some("FRANCE"), Some("adam.clement@gmail.com"), Some("+33149404072"), Some("19-06-2001"), None, Some(""), Some(""), Some("F")),
    Client(13, "C013", Some("Monsieur"), "FORT", "Gabriel", Some(5), Some("1"), Some("AVENUE DE CARTAGE"), Some("99000"), Some("TUNIS"), Some("TUNISIE"), Some("gabriel.fort@yahoo.fr"), Some("+21624801777"), Some("05-05-1985"), Some("17-09-2000"), Some(""), Some(""), Some("F")),
    Client(14, "C014", Some("Monsieur"), "ADAM", "ADAMO", Some(5), Some("1"), Some("AVENUE DE ROME"), Some("99001"), Some("ROME"), Some("ITALIE"), Some("adamo.adamé@gmail com"), Some(""), Some("12-12-2000"), Some("20-10-2020"), Some(""), Some(""), Some("F")),
    Client(15, "C015", Some("Monsieur"), "Labsent", "pala", Some(7), Some("1"), Some("rue des absents"), Some("000"), Some("BAGDAD"), Some("IRAQ"), Some("pala-labsent@paici"), Some(""), None, None, Some(""), Some(""), Some("F")),
    Client(16, "C016", Some("Madame"), "obsolete", "kadym", Some(7), Some("1"), Some("rue des anciens"), Some("000"), Some("CARTHAGE"), Some("IFRIQIA"), Some("inexistant"), Some("inexistant"), None, None, Some(""), Some(""), Some("F")),
    Client(17, "C017", Some("Madame"), "RAHYM", "Karym", Some(1), Some("1"), Some("RUE DES GENTILS"), Some("1000"), Some("CARTHAGE"), Some("TUNISIE"), Some("karym.rahym@gmail.com"), Some("+21624808444"), Some("01-01-1990"), Some("05-01-2021"), Some(""), Some(""), Some("F")),
    Client(18, "C018", Some("Madame"), "GENIE", "ADAM", Some(6), Some("8"), Some("BOULEVARD FOCH"), Some("93800"), Some("EPINAY SUR SEINE"), Some("FRANCE"), Some("adam.génie@gmail.com"), Some("+33777889911"), Some("01-01-1990"), Some("11-11-2011"), Some(""), Some(""), Some("F")),
    Client(19, "C019", Some("Madame"), "GENIE", "GENIALE", Some(3), Some("16"), Some("AVENUE FOCH"), Some("75016"), Some("PARIS"), Some("FRANCE"), Some("genialegenie@gmail.com"), Some("+33777889900"), Some("17-09-1988"), Some("11-11-2011"), Some(""), Some(""), Some("F")),
    Client(20, "C020", Some("Madame"), "GENIe", "GENIAL", Some(3), Some("16"), Some("AVENUE FOCH"), Some("75016"), Some("PARIS"), Some("FRENCE"), Some("genialegenie@gmail.com"), Some("0777889900"), Some("17-09-1988"), Some("11-11-2011"), Some(""), Some(""), Some("F")),
    Client(21, "C021", Some("Madame"), "LAPARISIENNE", "Belle", Some(3), Some("26"), Some("AVENUE FOCH"), Some("75016"), Some("PARIS"), Some(""), Some("belle.laparisienne@gmail.com"), Some("+33777889977"), Some("17-09-1988"), Some("11-11-2011"), Some(""), Some(""), Some("F")),
    Client(22, "C022", Some("Mademoiselle"), "AFRICAINE", "Belle", Some(9), Some("26"), Some("AVENUE FOCH"), Some("75016"), Some("PARIS"), Some(""), Some("belle.africaine@hotmail.com"), Some("+33777889911"), Some("17-09-1988"), Some("11-11-2011"), Some(""), Some(""), Some("F")),
    Client(23, "C023", Some("Mademoiselle"), "AFRICAINE", "Belle", Some(9), Some("26"), Some("AVENUE FOCH"), Some("75016"), Some("DAKAR"), Some(""), Some("africaineb@gmail.com"), Some("+33777889922"), Some("17-09-1988"), Some("11-11-2011"), Some(""), Some(""), Some("F")),
    Client(24, "C118", Some("Madame"), "GENIE", "Adam", Some(3), Some("8"), Some("BOULEVARD FOCH"), Some("93800"), Some("EPINAY    SUR     SEINE"), Some("FRANCE"), Some("adam.génie@gmail.com"), Some("+33777889911"), Some("17-09-1988"), None, Some(""), Some(""), Some("F")),
    Client(25, "C119", Some("MadamE"), "UNE", "Marie", Some(6), Some("17"), Some("AVENUE D ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("marieune@gmail.com"), Some("0617586575"), Some("01-01-1991"), None, Some(""), Some(""), Some("F")),
    Client(26, "C120", Some("MADAME"), "1", "MARIE", Some(1), Some("17"), Some("AVENUE D ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("MARIEUNE@GMAIL.COM"), Some("0617586575"), Some("01-01-1991"), None, Some(""), Some(""), Some("F")),
    Client(27, "C121", Some("Monsieur"), "2 PAR 2", "Girard", Some(1), Some("27"), Some("AVENUE D ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("2PAR2@GMAIL.COM"), Some("0617586577"), Some("02-02-1982"), None, Some(""), Some(""), Some("F")),
    Client(28, "C122", Some("Monsieur"), "DE PAR DE", "GIRARD", Some(1), Some("27"), Some("AVENUE D-ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("2PAR2@GMAIL.COM"), Some("0617586577"), Some("02-02-1982"), None, Some(""), Some(""), Some("F")),
    Client(29, "C123", Some("Monsieur"), "DE PAR DE", "GIRARD", Some(1), Some("27"), Some("AVENUE D'ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("2PAR2@GMAIL.COM"), Some("0617586577"), None, None, Some(""), Some(""), Some("F")),
    Client(30, "C124", Some("Monsieur"), "DE    PAR       DE", "Girard", Some(1), Some("27"), Some("AVENUE D_ITALIE"), Some("75013"), Some("PARIS"), Some("FRANCE"), Some("2PAR2@GMAIL.COM"), Some("0617586577"), Some("02-02-1982"), None, Some(""), Some(""), Some("F")),
    Client(31, "C125", Some("Monsieur"), "DE PAR DE", "Girard", Some(1), Some("27"), Some("AVENUE D_ITALIE"), Some("75013"), Some("PARIS"), Some("france"), Some("2PAR2@GMAIL.COM"), Some("0617586577"), Some("02-02-1982"), None, Some(""), Some(""), Some("F")),
    Client(32, "C126", Some("Monsieur"), "DE PAR DE", "Gir@rd", Some(1), Some("27"), Some("AVENUE@D_ITALIE/"), Some("75013"), Some("paris"), Some("france"), Some("2PAR2@GMAIL.COM"), Some("0617586577"), Some("02-02-1982"), None, Some(""), Some(""), Some("F")),
    Client(33, "C127", Some("Monsieur"), "SMITH", "John", Some(1), Some(""), Some(""), Some(""), Some("LONDON"), Some("United-Kingdom"), Some(""), Some(""), Some("03-03-1983"), None, Some(""), Some(""), Some("F")),
    Client(34, "C131", Some("MONsieur"), "CATS", "BiLL", Some(9), Some(""), Some("Maison Planchhhe"), Some(""), Some("NEW-YORk"), Some("UNITED-STATS-AMERICA"), Some(""), Some(""), Some("17-09-1978"), None, Some(""), Some(""), Some("F")),
    Client(35, "C295", Some("MONSIEUr"), "MOUCHE", "Gorge", Some(3), Some("-"), Some("-"), Some("-"), Some("L'Hay-Les-Roses"), Some("-"), Some("usapresident@labas.com"), Some("-"), Some("02-02-1950"), Some("20-01-1991"), None, Some(""), Some("F")),
    Client(36, "C296", Some("MONSIEUR"), "MOUBARAK", "OOObana", Some(3), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("15-05-1965"), Some("20-01-2008"), Some(""), Some(""), Some("F")),
    Client(37, "C297", Some("MADAME"), "CLEANTOOON", "Hilally", Some(3), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("15-05-1966"), Some("20-01-2016"), Some(""), Some(""), Some("F")),
    Client(38, "C298", Some("monsieur"), "TROMPE.", "Ronald", Some(-3), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("usapresident@labas.com"), Some("-"), Some("10-10-1945"), Some("20-01-2016"), None, Some(""), None),
    Client(39, "C299", Some("MONSIEUuR"), "BIDON!", "Joie", Some(3), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("10-10-1941"), Some("03-11-2020"), Some("-"), Some(""), Some("F")),
    Client(40, "C300", Some("MONSIEUR"), "HOBAAAMA", "M'Barek", Some(3), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("-"), Some("10-10-1985"), Some("20-01-2008"), Some("-"), Some(""), Some("F")),
    Client(41, "C554", Some("Monsieur"), "ALIBABA", "Mystere", Some(1), Some("55"), Some("Rue De Belleville"), Some("75019"), Some("PARIS"), Some("FRANCE"), Some("sezameouvretoi.alibaba.myster@gmail.com"), Some("0697837311"), Some("12-12-1992"), None, Some(""), Some(""), Some("F"))
  )

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  val columns: Seq[String] = Seq("clients_id", "codcli", "civcli", "nomcli",
    "prencli", "catcli", "adncli", "adrcli", "cpcli", "vilcli", "payscli",
    "mailcli", "telcli", "datnaiscli", "dpremcontactcli", "obscli", "remcli",
    "genrecli")

  private def q(s: Option[String]): String =
    s.map(v => "'" + v.replace("'", "''") + "'").getOrElse("NULL")

  /** `(VALUES ...) AS clients(clients_id, codcli, ...)` for DuckDB. */
  def sqlValues: String = {
    val vals = rows.map { c =>
      val fs = Seq(c.clients_id.toString, q(Some(c.codcli)), q(c.civcli),
        q(Some(c.nomcli)), q(Some(c.prencli)),
        c.catcli.map(_.toString).getOrElse("NULL"), q(c.adncli), q(c.adrcli),
        q(c.cpcli), q(c.vilcli), q(c.payscli), q(c.mailcli), q(c.telcli),
        q(c.datnaiscli), q(c.dpremcontactcli), q(c.obscli), q(c.remcli),
        q(c.genrecli))
      fs.mkString("(", ", ", ")")
    }
    vals.mkString("(VALUES ", ", ", s") AS clients(${columns.mkString(", ")})")
  }
}
