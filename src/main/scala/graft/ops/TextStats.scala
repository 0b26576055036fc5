package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.doc_fingerprint

/** Text-analysis operators for training-data pipelines: quality
  * scoring, token counting, fingerprinting. All codegen'd builtins or
  * custom expressions — no UDFs.
  */
object TextStats {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Whitespace token count (A15 analog). `''` counts as one token of
    * the empty string — callers filter blank text upstream.
    */
  def tokenCountCol(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Stopword fraction of whitespace tokens (lowercased). */
  def stopwordRatioCol(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stop = filter(toks, t => t.isInCollection(Stopwords))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stop).cast("double") / size(toks).cast("double"))
  }

  /** Punctuation/symbol fraction of characters (regex-based so the same
    * expression is writable in the DuckDB oracle).
    */
  def symbolRatioCol(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(text).cast("double"))

  /** Composite heuristic quality score in [0,1]: long enough, low
    * symbol noise, sane stopword ratio. The corpus-level analog of the
    * reference's per-table quality score (utils.py:491-509).
    */
  def qualityScoreCol(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val symPenalty = greatest(lit(0.0), lit(1.0) - symbolRatioCol(text) * 3.0)
    val stopScore = least(stopwordRatioCol(text) * 5.0, lit(1.0))
    round((lenScore * 0.4 + symPenalty * 0.4 + stopScore * 0.2), 6)
  }

  /** 64-bit rolling document fingerprint (case/whitespace-insensitive). */
  def fingerprintCol(text: Column): Column = doc_fingerprint(text)

  /** Per-source profile: the reference's column-profiling pass (counts,
    * min/max lengths, case stats — functions.sql:107-314) over a text
    * corpus, one aggregation pass.
    */
  def profile(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val t = col(textCol)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(t.isNull || trim(t) === "", 1).otherwise(0)).as("n_blank"),
        min(length(t)).as("min_len"),
        max(length(t)).as("max_len"),
        round(avg(length(t)), 4).as("avg_len"),
        sum(when(t === upper(t), 1).otherwise(0)).as("n_upper"),
        sum(when(t === lower(t), 1).otherwise(0)).as("n_lower"),
        round(avg(tokenCountCol(t)), 4).as("avg_tokens"))
      .orderBy(col(groupCol))
  }
}
