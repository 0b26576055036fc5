package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.{repetition_ratio, symbol_density}
import graft.lang.LangId
import graft.rules.RuleConfig._
import graft.schema.{ScoredTurn, Turn}
import graft.scrub.Scrub

/** The quality-filter pipeline (north rule): typed Dataset in, labeled +
  * scrubbed DataFrame out. One mapPartitions pass for broadcast-model
  * inference (language-ID + perplexity — the only non-Catalyst stage),
  * then pure Catalyst: scrub chain, heuristic rules, conversation
  * windows, lineage array.
  *
  * Scale design (SURVEY.md §4.2/§7.5):
  *  - ONE shuffle by conv_id feeds every conversation-scoped operator:
  *    the sequential window (lag-based contiguity/ts rules), the
  *    duplicate window (ClusteredDistribution(conv_id, norm_text) is
  *    satisfied by hashpartitioning(conv_id)), the conversation language
  *    vote (partial agg map-side, then per-conv row), and the vote
  *    join-back (both sides already partitioned by conv_id).
  *  - All per-turn rules are codegen'd expressions (literal-pattern
  *    regexes + custom expressions with doGenCode) — no UDFs in the hot
  *    path besides the single model-inference mapPartitions.
  *  - Giant conversations land in one partition only for the lag window
  *    (its state is O(1) per row); the vote aggregation is partial-agg'd
  *    so a 10k-turn conversation contributes one row per map task.
  */
object QualityFilter {

  /** Stage 1: broadcast-model inference + whitespace normalization in a
    * single pass (north_star: "fastText language-ID (broadcast model,
    * mapPartitions batched inference)" + KenLM-style perplexity).
    */
  def score(ds: Dataset[Turn]): Dataset[ScoredTurn] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val langBc = spark.sparkContext.broadcast(LangId.default)
    val pplBc = spark.sparkContext.broadcast(LangId.pplModel)
    ds.mapPartitions { it =>
      val langModel = langBc.value
      val pplModel = pplBc.value
      it.map { t =>
        val norm = Scrub.normalizeWsPlain(t.text)
        val (lang, conf) =
          if (norm == null || norm.isEmpty) ("und", 0.0)
          else langModel.classify(norm)
        val ppl =
          if (norm == null || norm.isEmpty) 1.0
          else pplModel.perplexity(norm)
        ScoredTurn(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
          norm, lang, conf, ppl)
      }
    }
  }

  /** Column predicate: the turn is "empty" (null text, blank, or a
    * missing-value sentinel after normalization) — F1 semantics.
    */
  private def emptyPred(text: Column, norm: Column): Column =
    text.isNull || norm.isin(Sentinels.toSeq: _*)

  /** Eligibility for model-based rules + the conversation language vote:
    * non-empty, long enough to carry signal, and not a tool payload.
    */
  private def modelEligible(text: Column, norm: Column, role: Column): Column =
    !emptyPred(text, norm) && length(norm) >= PplMinChars && !(role <=> lit("tool"))

  /** Stage 2: full labeling. Input may be pre-scored (to reuse) or raw. */
  def label(ds: Dataset[Turn]): DataFrame = labelScored(score(ds))

  def labelScored(scored: Dataset[ScoredTurn]): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._

    // One explicit shuffle by conv_id; EVERY conversation-scoped
    // operator below is a window over that same hash partitioning
    // (ClusteredDistribution on (conv_id, ...) is satisfied by
    // hashpartitioning(conv_id)), so the expensive scored subtree is
    // computed exactly once and never re-shuffled — only re-sorted
    // within partitions. Verified via explain in PipelinePlanSpec.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val byConv = scored.repartition(parts, $"conv_id")

    val eligible = modelEligible($"text", $"norm_text", $"role")

    val wSeq = Window.partitionBy($"conv_id").orderBy($"turn_idx")
    val wDup = Window.partitionBy($"conv_id", $"norm_text").orderBy($"turn_idx")
    val wConvLang = Window.partitionBy($"conv_id", $"lang")
    val wConv = Window.partitionBy($"conv_id")

    // Conversation language vote as pure window aggregates (no join, no
    // second branch): per-(conv, lang) eligible count, then the
    // deterministic mode = min(struct(-count, lang)) over the conv
    // (count desc, lang asc tie-break). Aggregates ignore nulls, so
    // non-eligible rows don't vote. Two steps because window functions
    // can't nest.
    val withWindows = byConv
      .withColumn("rn_seq", row_number().over(wSeq))
      .withColumn("prev_idx", lag($"turn_idx", 1).over(wSeq))
      .withColumn("prev_ts", lag($"ts", 1).over(wSeq))
      .withColumn("dup_rank",
        when(emptyPred($"text", $"norm_text"), lit(1))
          .otherwise(row_number().over(wDup)))
      .withColumn("vote_cnt", count(when(eligible, 1)).over(wConvLang))
      .withColumn("conv_lang", coalesce(
        min(when(eligible, struct((-$"vote_cnt").as("negN"), $"lang")))
          .over(wConv).getField("lang"),
        lit("und")))

    val empty = emptyPred($"text", $"norm_text")
    val nLen = when($"norm_text".isNull, lit(0)).otherwise(length($"norm_text"))

    val preds: Seq[(String, Column)] = Seq(
      RuleEmpty -> empty,
      RuleLength -> (!empty && (nLen < MinLen || nLen > MaxLen)),
      // tool-role turns carry structured payloads (JSON/code) — exempt
      // from the prose-shape rules, like the model rules below
      RuleSymbol -> (!empty && !($"role" <=> lit("tool")) &&
        nLen >= SymbolDensityMinLen &&
        symbol_density($"norm_text") > SymbolDensityThreshold),
      RuleRepetition -> (!empty && !($"role" <=> lit("tool")) &&
        nLen >= RepetitionMinGrams + RepetitionOrder - 1 &&
        repetition_ratio($"norm_text", RepetitionOrder) < RepetitionDistinctMin),
      RuleBadRole -> ($"role".isNull || !$"role".isin(AllowedRoles.toSeq: _*)),
      // null-safe: a null role must behave like contains(null)=false
      RuleBadTool -> (($"tool".isNotNull &&
        !coalesce($"role".isin(ToolBearingRoles.toSeq: _*), lit(false))) ||
        ($"role" <=> lit("tool") && $"tool".isNull)),
      RuleNonContiguous -> (when($"rn_seq" === 1, $"turn_idx" =!= 0)
        .otherwise($"turn_idx" =!= $"prev_idx" + 1)),
      RuleTsRegress -> ($"rn_seq" > 1 && $"ts".isNotNull && $"prev_ts".isNotNull &&
        $"ts" < $"prev_ts"),
      RuleDuplicate -> (!empty && $"dup_rank" > 1),
      RuleLang -> (eligible && !$"lang".isin(AllowedLangs.toSeq: _*) &&
        ($"lang_conf" >= LangDropConf || !$"conv_lang".isin(AllowedLangs.toSeq: _*))),
      RulePpl -> (eligible && $"ppl" > PplMax)
    )
    require(preds.map(_._1) == RuleOrder, "rule order drift vs RuleConfig")

    val reasons = array_compact(array(
      preds.map { case (name, p) => when(p, lit(name)) }: _*))

    val (scrubbed, counts) = Scrub.scrubCol($"norm_text")

    withWindows
      .withColumn("drop_reasons", reasons)
      .withColumn("keep", size($"drop_reasons") === 0)
      .withColumn("scrubbed_text", scrubbed)
      .withColumn("scrub_counts", counts)
      .select(
        $"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts",
        $"keep", $"drop_reasons", $"scrubbed_text",
        $"lang", $"lang_conf", $"ppl", $"scrub_counts")
  }

  /** End-to-end convenience: read parquet transcripts → labeled output. */
  def run(spark: SparkSession, inputPath: String): DataFrame = {
    import spark.implicits._
    label(spark.read.schema(Turn.schema).parquet(inputPath).as[Turn])
  }
}
