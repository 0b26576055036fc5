package graft.scrub

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.rules.RuleConfig

/** Ordered PII/toxicity scrub chain (emails → keys → phones → slurs)
  * over whitespace-normalized text, with per-rule replacement counts.
  *
  * Two implementations of the SAME chain (patterns + order come from
  * [[RuleConfig.ScrubChain]] only):
  *  - [[scrubCol]]: Catalyst columns (`regexp_replace`/`regexp_count`,
  *    literal patterns → the java.util.regex Pattern is compiled once
  *    per task by codegen, satisfying "compiled once per partition").
  *  - [[scrubPlain]]: sequential java.util.regex, used by the golden
  *    oracle. Spark's regexp_* are java.util.regex underneath, so the
  *    two are dialect-identical by construction.
  *
  * Reference ancestry: correction chain order api.py:812-906; email
  * null-out + lowercase utils.py:1481-1486; trim/collapse C3
  * utils.py:1458-1463; regex registry db_configs/data_types.json.
  */
object Scrub {

  /** Whitespace normalization: collapse all whitespace runs to a single
    * space, then strip the (single possible) leading/trailing space.
    * Applied before the PII chain and before every text-quality rule.
    * Both paths use the same two regexes — String.trim would strip
    * non-\s control chars (< U+0020) that Spark's trim() keeps.
    */
  def normalizeWsCol(c: Column): Column =
    regexp_replace(regexp_replace(c, RuleConfig.WhitespaceRe, " "), "^ | $", "")

  private val wsPat = Pattern.compile(RuleConfig.WhitespaceRe)
  private val edgePat = Pattern.compile("^ | $")

  def normalizeWsPlain(s: String): String =
    if (s == null) null
    else edgePat.matcher(wsPat.matcher(s).replaceAll(" ")).replaceAll("")

  /** Column-side chain. Returns (scrubbed_text, scrub_counts) where the
    * count for each rule is the number of matches in the text state at
    * that point of the chain (identical to the sequential semantics).
    */
  def scrubCol(normText: Column): (Column, Column) = {
    var cur = normText
    val counts = RuleConfig.ScrubChain.map { case (rule, pattern, repl) =>
      val n = when(cur.isNull, lit(0))
        .otherwise(regexp_count(cur, lit(pattern)))
        .cast("int")
      val next = regexp_replace(cur, pattern, repl)
      cur = next
      (rule, n)
    }
    val mapCol = map(
      counts.flatMap { case (rule, n) => Seq(lit(rule), n) }: _*
    )
    (cur, mapCol)
  }

  // Compiled once per JVM; shared by oracle + tests.
  private val compiled: Seq[(String, Pattern, String)] =
    RuleConfig.ScrubChain.map { case (rule, p, repl) =>
      (rule, Pattern.compile(p), repl)
    }

  /** Sequential chain (golden oracle). */
  def scrubPlain(normText: String): (String, Map[String, Int]) = {
    if (normText == null) {
      return (null, RuleConfig.ScrubChain.map { case (r, _, _) => r -> 0 }.toMap)
    }
    var cur = normText
    val counts = compiled.map { case (rule, pat, repl) =>
      val m = pat.matcher(cur)
      var n = 0
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        n += 1
        sb.append(cur, last, m.start()).append(repl)
        last = m.end()
      }
      sb.append(cur, last, cur.length)
      cur = sb.toString
      rule -> n
    }
    (cur, counts.toMap)
  }
}
