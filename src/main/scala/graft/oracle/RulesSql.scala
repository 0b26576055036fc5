package graft.oracle

import graft.rules.RuleConfig._

/** Renders the flagship rules layer — SkewSplit.finishLabeling plus the
  * dup/seq windows and the conversation language vote — as DuckDB SQL
  * over a persisted ScoredTurn parquet table.
  *
  * This is the driver-side independent check of everything downstream
  * of the model pass: the mapPartitions scoring stage (language-ID +
  * perplexity + text metrics) is not SQL-expressible, but its OUTPUT is
  * just columns; persisting it lets DuckDB re-derive keep/drop,
  * lineage, and scrubbed text from first principles (window functions,
  * CASE logic, regexp_replace) and hash-compare against the pipeline.
  *
  * Single source of truth: every threshold, sentinel, regex, and the
  * rule order come from [[graft.rules.RuleConfig]]; the language list
  * comes from [[graft.lang.LangId]] — the SQL is generated, never
  * hand-copied. All scrub patterns are RE2-compatible (no backrefs or
  * lookaround), which ScrubPropertySpec pins.
  */
object RulesSql {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"
  private def inList(xs: Iterable[String]): String =
    xs.map(q).mkString("(", ", ", ")")

  /** Languages the vote sums over — the classifier's fixed label set. */
  def voteLangs: Seq[String] = graft.lang.LangId.default.langs.toSeq

  /** Whitespace-normalize + ordered PII scrub chain over a text column,
    * mirroring GraftExpressions.scrubAll (normalize → email → key →
    * phone → slur, each global).
    */
  def scrubSql(src: String): String = {
    val norm =
      s"regexp_replace(regexp_replace($src, ${q(WhitespaceRe)}, ' ', 'g'), ${q("^ | $")}, '', 'g')"
    ScrubChain.foldLeft(norm) { case (acc, (_, pattern, repl)) =>
      s"regexp_replace($acc, ${q(pattern)}, ${q(repl)}, 'g')"
    }
  }

  private def eligibleSql: String =
    s"(NOT is_empty AND norm_len >= $PplMinChars AND role IS DISTINCT FROM 'tool')"

  /** (rule id, SQL condition) in RuleOrder, over the windowed row set
    * (columns: ScoredTurn.* + dup_rank, is_first, prev_idx, prev_ts,
    * conv_lang). Mirrors SkewSplit.finishLabeling's predicates 1:1.
    */
  def ruleConds: Seq[(String, String)] = {
    val conds = Seq(
      RuleEmpty -> "is_empty",
      RuleLength ->
        s"(NOT is_empty AND (norm_len < $MinLen OR norm_len > $MaxLen))",
      RuleSymbol ->
        s"""(NOT is_empty AND role IS DISTINCT FROM 'tool'
            AND norm_len >= $SymbolDensityMinLen
            AND sym_density > CAST($SymbolDensityThreshold AS DOUBLE))""",
      RuleRepetition ->
        s"""(NOT is_empty AND role IS DISTINCT FROM 'tool'
            AND norm_len >= ${RepetitionMinGrams + RepetitionOrder - 1}
            AND rep_ratio < CAST($RepetitionDistinctMin AS DOUBLE))""",
      RuleBadRole ->
        s"(role IS NULL OR role NOT IN ${inList(AllowedRoles.toSeq.sorted)})",
      RuleBadTool ->
        s"""((tool IS NOT NULL AND NOT coalesce(role IN ${inList(ToolBearingRoles.toSeq.sorted)}, false))
            OR (role IS NOT DISTINCT FROM 'tool' AND tool IS NULL))""",
      RuleNonContiguous ->
        "(CASE WHEN is_first THEN turn_idx <> 0 ELSE turn_idx <> prev_idx + 1 END)",
      RuleTsRegress ->
        "(NOT is_first AND ts IS NOT NULL AND prev_ts IS NOT NULL AND ts < prev_ts)",
      RuleDuplicate -> "(NOT is_empty AND dup_rank > 1)",
      RuleLang ->
        s"""($eligibleSql AND lang NOT IN ${inList(AllowedLangs.toSeq.sorted)}
            AND (lang_conf >= CAST($LangDropConf AS DOUBLE)
                 OR conv_lang NOT IN ${inList(AllowedLangs.toSeq.sorted)}))""",
      RulePpl -> s"($eligibleSql AND ppl > CAST($PplMax AS DOUBLE))"
    )
    require(conds.map(_._1) == RuleOrder, "rule order drift vs RuleConfig")
    conds
  }

  /** CTE chain from a ScoredTurn parquet directory to relation `r`
    * (every ScoredTurn column + `reasons`): windows → vote → rules.
    */
  def labelCtes(scoredGlob: String): String = {
    val voteSums = voteLangs.map(l =>
      s"""sum(CASE WHEN $eligibleSql AND lang = ${q(l)} THEN 1 ELSE 0 END)
          OVER (PARTITION BY conv_id) AS cnt_$l""").mkString(",\n           ")
    val maxCnt = voteLangs.map(l => s"cnt_$l").mkString("greatest(", ", ", ")")
    val voteCase = voteLangs.map(l =>
      s"WHEN cnt_$l = max_cnt THEN ${q(l)}").mkString(" ")
    val reasonCases = ruleConds.map { case (name, cond) =>
      s"CASE WHEN $cond THEN ${q(name)} END"
    }.mkString(",\n           ")
    s"""WITH st AS (SELECT * FROM ${q(scoredGlob)}),
       w AS (SELECT st.*,
           CASE WHEN is_empty THEN 1
                ELSE row_number() OVER (PARTITION BY conv_id, norm_hash ORDER BY turn_idx)
           END AS dup_rank,
           (row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)) = 1 AS is_first,
           lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx,
           lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts,
           $voteSums
         FROM st),
       v AS (SELECT *, $maxCnt AS max_cnt FROM w),
       c AS (SELECT *,
           CASE WHEN max_cnt > 0 THEN (CASE $voteCase END) ELSE 'und' END AS conv_lang
         FROM v),
       r AS (SELECT *, concat_ws('|',
           $reasonCases) AS reasons
         FROM c)"""
  }

  /** Full re-labeling query over a ScoredTurn parquet directory:
    * windows → vote → rules → scrub, ending in the qf1 output shape
    * (conv_id, turn_idx, keep, reasons, scrubbed_text, lang, ppl).
    */
  def relabelSql(scoredGlob: String): String =
    s"""${labelCtes(scoredGlob)}
       SELECT conv_id, turn_idx, (reasons = '') AS keep, reasons,
         ${scrubSql("text")} AS scrubbed_text, lang, round(ppl, 4) AS ppl
       FROM r ORDER BY conv_id, turn_idx"""

  /** Relabel + the opt-in conversation near-dup rule (qf5):
    * `extraCtes` must define relation `droppedRel(conv_id)` — the
    * non-survivor conversations, derived by the caller from brute-force
    * pair ground truth — appended to the labelCtes chain (names w/v/c/r
    * are taken). Every turn of a dropped conversation flips keep=false
    * and gets RuleConvNearDup appended LAST, mirroring
    * QualityFilter.withConvNearDup.
    */
  def relabelWithConvDropSql(scoredGlob: String, extraCtes: String,
                             droppedRel: String): String =
    s"""${labelCtes(scoredGlob)},
       $extraCtes,
       f AS (SELECT r.*,
               -- coalesce: IN is NULL for a NULL conv_id, but Spark's
               -- withConvNearDup left join never flags a null-id row
               coalesce((conv_id IN (SELECT conv_id FROM $droppedRel)), false) AS cnd
             FROM r)
       SELECT conv_id, turn_idx, (reasons = '' AND NOT cnd) AS keep,
         CASE WHEN NOT cnd THEN reasons
              WHEN reasons = '' THEN ${q(RuleConvNearDup)}
              ELSE reasons || '|' || ${q(RuleConvNearDup)} END AS reasons
       FROM f ORDER BY conv_id, turn_idx"""

  /** Relabel + the opt-in cross-conversation boilerplate rule (qf6):
    * the census is re-derived from the seam's own norm_hash column
    * (eligibility, distinct-conversation count, and thresholds all
    * rendered from RuleConfig — one source of truth with
    * QualityFilter.boilerplateDropKeys), and flagged turns get
    * RuleBoilerplate appended exactly like withBoilerplate.
    */
  def relabelWithBoilerplateSql(scoredGlob: String): String =
    s"""${labelCtes(scoredGlob)},
       bel AS (SELECT conv_id, turn_idx, norm_hash FROM st
               WHERE NOT is_empty AND norm_len >= $BoilerplateMinLen
                 AND role IS DISTINCT FROM 'tool'),
       bcen AS (SELECT norm_hash
                FROM (SELECT DISTINCT norm_hash, conv_id FROM bel)
                GROUP BY norm_hash HAVING count(*) >= $BoilerplateMinConvs),
       bdrop AS (SELECT bel.conv_id, bel.turn_idx FROM bel
                 JOIN bcen USING (norm_hash)),
       f AS (SELECT r.*, (d.conv_id IS NOT NULL) AS bp
             FROM r LEFT JOIN bdrop d
               ON d.conv_id = r.conv_id AND d.turn_idx = r.turn_idx)
       SELECT conv_id, turn_idx, (reasons = '' AND NOT bp) AS keep,
         CASE WHEN NOT bp THEN reasons
              WHEN reasons = '' THEN ${q(RuleBoilerplate)}
              ELSE reasons || '|' || ${q(RuleBoilerplate)} END AS reasons
       FROM f ORDER BY conv_id, turn_idx"""

  /** Relabel + the opt-in benchmark-decontamination rule (qf7): the
    * contaminated-turn set is re-derived from first principles — the
    * dc1 tokenization (lowercase, whitespace split, distinct `n`-token
    * windows as space-joined strings) over every turn's text, the bench
    * gram set from the turns satisfying `benchPred` (a SQL predicate
    * over (conv_id, turn_idx)), and a turn is contaminated when ≥
    * `minMatches` of its distinct grams appear in the bench set —
    * mirroring QualityFilter.contaminatedTurnKeys + withContaminated
    * (the Spark side matches 64-bit gram fingerprints; agreement needs
    * no collision among the corpus' grams, ~1e-9 at 1e7 grams).
    */
  def relabelWithContaminatedSql(scoredGlob: String, benchPred: String,
                                 n: Int, minMatches: Int): String = {
    val gram = (0 until n).map {
      case 0 => "toks[i]"
      case j => s"toks[i+$j]"
    }.mkString(" || ' ' || ")
    s"""${labelCtes(scoredGlob)},
       ctok AS (SELECT conv_id, turn_idx,
           list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
             x -> x <> '') AS toks
         FROM st),
       cgr AS (SELECT conv_id, turn_idx,
           CASE WHEN len(toks) < $n THEN CAST([] AS VARCHAR[])
                ELSE list_distinct(list_transform(
                  generate_series(1, len(toks) - ${n - 1}), i -> $gram))
           END AS grams
         FROM ctok),
       cbg AS (SELECT list(DISTINCT g) AS bg
         FROM (SELECT unnest(grams) AS g FROM cgr WHERE $benchPred)),
       cdrop AS (SELECT conv_id, turn_idx FROM cgr, cbg
         WHERE coalesce(len(list_intersect(grams, bg)), 0) >= $minMatches),
       f AS (SELECT r.*, (d.conv_id IS NOT NULL) AS ct
             FROM r LEFT JOIN cdrop d
               ON d.conv_id = r.conv_id AND d.turn_idx = r.turn_idx)
       SELECT conv_id, turn_idx, (reasons = '' AND NOT ct) AS keep,
         CASE WHEN NOT ct THEN reasons
              WHEN reasons = '' THEN ${q(RuleContaminated)}
              ELSE reasons || '|' || ${q(RuleContaminated)} END AS reasons
       FROM f ORDER BY conv_id, turn_idx"""
  }

  /** Corpus-wide scrubbed-span totals per scrub rule (qf4) — the third
    * counter dimension of the north rule (kept/dropped/SCRUBBED per
    * rule), re-derived from first principles: the chain is rendered
    * stepwise (each stage's count = leftmost-non-overlapping matches in
    * the PREVIOUS stage's output, exactly Scrub.scrubPlain's
    * sequential semantics; NULL text counts 0 at every stage).
    */
  def scrubSpanCountsSql(scoredGlob: String): String = {
    val norm =
      s"regexp_replace(regexp_replace(text, ${q(WhitespaceRe)}, ' ', 'g'), ${q("^ | $")}, '', 'g')"
    val stages = new StringBuilder(
      s"WITH st AS (SELECT * FROM ${q(scoredGlob)}),\n  s0 AS (SELECT $norm AS t0 FROM st)")
    ScrubChain.zipWithIndex.foreach { case ((rule, pattern, repl), i) =>
      stages.append(
        s""",
  s${i + 1} AS (SELECT ${if (i + 1 < ScrubChain.size) s"regexp_replace(t$i, ${q(pattern)}, ${q(repl)}, 'g') AS t${i + 1}," else ""}
      ${(0 until i).map(j => s"c_${ScrubChain(j)._1},").mkString(" ")}
      CASE WHEN t$i IS NULL THEN 0
           ELSE len(regexp_extract_all(t$i, ${q(pattern)})) END AS c_$rule
    FROM s$i)""")
    }
    val unions = ScrubChain.map { case (rule, _, _) =>
      s"SELECT ${q(rule)} AS rule, CAST(sum(c_$rule) AS BIGINT) AS n_spans FROM s${ScrubChain.size}"
    }.mkString("\n  UNION ALL ")
    s"""${stages.toString}
  $unions
  ORDER BY rule"""
  }

  /** The IQR perplexity variant (qf3): quartiles of the eligible turns'
    * ppl via quantile_cont (the same linear interpolation
    * Stats.exactPercentiles is bit-faithful to), widened by k·IQR; one
    * row per eligible turn with the oracle's own outlier verdict. The
    * pipeline's drop:perplexity labels under
    * QualityFilter.pplIqrBounds must hash-match this exactly.
    */
  def pplIqrSql(scoredGlob: String): String =
    s"""WITH st AS (SELECT * FROM ${q(scoredGlob)}),
       el AS (SELECT * FROM st WHERE $eligibleSql),
       b AS (SELECT quantile_cont(ppl, 0.25) AS q1,
                    quantile_cont(ppl, 0.75) AS q3 FROM el)
       SELECT conv_id, turn_idx, round(ppl, 4) AS ppl,
         (ppl < q1 - CAST($PplIqrK AS DOUBLE) * (q3 - q1)
          OR ppl > q3 + CAST($PplIqrK AS DOUBLE) * (q3 - q1)) AS ppl_outlier
       FROM el, b ORDER BY conv_id, turn_idx"""

  /** Per-rule drop totals re-derived from the same seam — the
    * independent check of the Metrics lineage roll-up (bucket keys are
    * xxhash64-based and not DuckDB-expressible, so the oracle checks
    * the per-rule totals across buckets).
    */
  def ruleCountsSql(scoredGlob: String): String =
    s"""${labelCtes(scoredGlob)}
       SELECT rule, CAST(count(*) AS BIGINT) AS n_dropped
       FROM (SELECT unnest(string_split(reasons, '|')) AS rule
             FROM r WHERE reasons <> '')
       GROUP BY rule ORDER BY rule"""
}
