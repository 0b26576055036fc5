package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources/sinks (SURVEY.md §2.1): CSV with separator decode + header
  * handling + schema sanitization, JSON, ordered exports. The
  * reference's row-at-a-time ingest (utils.py:108-129) becomes the
  * vectorized reader; its name-mangling rules are reproduced exactly.
  */
object Sources {

  /** Separator decode (S8, utils.py:739-747). */
  def decodeSeparator(name: String): String = name match {
    case "Virgule" => ","
    case "Point virgule" => ";"
    case "Tabulation" => "\t"
    case other => other
  }

  /** Column-name sanitization (S4 + clean_column_name,
    * utils.py:529-534 / :636-648): non-alnum → '_', digit-leading
    * names prefixed with "_ch".
    */
  def sanitizeName(c: String): String = {
    val cleaned = c.replaceAll("[^0-9a-zA-Z_]", "_")
    if (cleaned.nonEmpty && Character.isDigit(cleaned.charAt(0))) s"_ch$cleaned"
    else cleaned
  }

  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName): _*)

  /** CSV source (S1/S2): explicit schema or inference, `''` → null as
    * in parse_file (utils.py:554-621); the broken-line repair heuristic
    * is unnecessary for fixed-schema input but multiLine handles quoted
    * newlines.
    */
  def readCsv(spark: SparkSession, path: String, sep: String = ",",
              header: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("sep", decodeSeparator(sep))
      .option("header", header)
      .option("nullValue", "")
      .option("multiLine", true)
    sanitizeColumns(schema.map(r.schema).getOrElse(r.option("inferSchema", true)).csv(path))
  }

  /** JSON source (S3). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    sanitizeColumns(spark.read.json(path))

  /** Ordered CSV export (S10, api.py:917-952): stable key order, PK
    * columns dropped, QUOTE_ALL.
    */
  def exportCsv(df: DataFrame, path: String, orderCols: Seq[String],
                dropCols: Seq[String] = Nil): Unit =
    df.orderBy(orderCols.map(col): _*)
      .drop(dropCols: _*)
      .write.mode("overwrite")
      .option("quoteAll", "true").option("header", "true")
      .csv(path)

  /** Ordered JSON export (S9, api.py:764-792). */
  def exportJson(df: DataFrame, path: String, orderCols: Seq[String]): Unit =
    df.orderBy(orderCols.map(col): _*)
      .write.mode("overwrite").json(path)
}
