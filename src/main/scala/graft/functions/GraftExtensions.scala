package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT
  * jaro_winkler(a, b) ...")` works and the functions are usable from
  * pure-SQL clients. Activate with
  *
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *
  * or programmatically via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  private[functions] val injections: Seq[
      (String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("jaro_winkler",
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      (args: Seq[Expression]) => JaroWinklerExpr(args(0), args(1))),
    ("repetition_ratio",
      info("repetition_ratio", "repetition_ratio(s, n) - distinct char n-gram fraction"),
      (args: Seq[Expression]) => RepetitionRatio(args.head,
        args.lift(1).map(_.eval().asInstanceOf[Number].intValue).getOrElse(3))),
    ("symbol_density",
      info("symbol_density", "symbol_density(s) - non-alnum non-space char fraction"),
      (args: Seq[Expression]) => SymbolDensityExpr(args.head)),
    ("sim_hash",
      info("sim_hash", "sim_hash(s) - 64-bit simhash over word 2-shingles"),
      (args: Seq[Expression]) => SimHashExpr(args.head)),
    ("doc_fingerprint",
      info("doc_fingerprint", "doc_fingerprint(s) - whitespace/case-insensitive 64-bit fingerprint"),
      (args: Seq[Expression]) => FingerprintExpr(args.head)),
    ("ngram_jaccard",
      info("ngram_jaccard", "ngram_jaccard(a, b, k) - word k-shingle Jaccard similarity"),
      (args: Seq[Expression]) => NgramJaccardExpr(args(0), args(1),
        args.lift(2).map(_.eval().asInstanceOf[Number].intValue).getOrElse(3))),
    ("scrub_all",
      info("scrub_all", "scrub_all(s) - struct(scrubbed_text, per-rule PII scrub counts)"),
      (args: Seq[Expression]) => ScrubAllExpr(args.head))
  )

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    injections.foreach { case (name, i, builder) =>
      reg.registerFunction(FunctionIdentifier(name), i, builder)
    }
  }
}
