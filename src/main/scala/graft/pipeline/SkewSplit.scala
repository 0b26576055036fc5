package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lang.LangId
import graft.rules.RuleConfig._
import graft.schema.ScoredTurn
import graft.scrub.Scrub

/** Explicit skew handling for pathological conversations (north rule:
  * "conv_id skew handled with salted repartitioning and AQE").
  *
  * Window functions need every row of a partition key in one task, so a
  * conversation with tens of millions of turns caps the window stage at
  * one straggler task no matter how many executors exist. AQE's skew
  * split only fixes JOINS, not windows — so we split explicitly:
  *
  *  1. conversation sizes via groupBy(conv_id).count — partial-agg'd,
  *     inherently skew-proof;
  *  2. conversations ≤ maxTurns take the standard single-sort window
  *     path ([[QualityFilter.labelScored]]);
  *  3. giant conversations take a range-bucketed path: turns are salted
  *     into (conv_id, turn_idx / maxTurns) buckets — windows partition
  *     on the salted key, so a 10M-turn conversation becomes many
  *     bounded tasks. The sequential rules (contiguity, ts-regression,
  *     first-turn) need one row of cross-bucket state: the last row of
  *     each bucket, carried by a per-bucket boundary table (rows =
  *     #buckets, tiny) lag-joined back on the salted key. The language
  *     vote becomes a two-phase aggregation + broadcast join (giant
  *     conversations are by definition few). Duplicate ranking already
  *     partitions by (conv_id, norm_hash), which spreads giant
  *     conversations naturally.
  *
  * Both paths produce identical labels (SkewSpec asserts equality with
  * the golden oracle and with the unsplit pipeline).
  */
object SkewSplit {

  /** Above this many giant conversations the collected id set stops
    * being "tiny" and the split falls back to join routing (also the
    * bound a bucketed runner must apply to its pre-computed giant
    * lists — see CheckpointedRun). Overridable per call via the
    * `maxCollectedGiants` parameter (tests exercise the overflow path
    * with a tiny bound instead of 65k+ giant conversations).
    */
  private[graft] val MaxCollectedGiants = 65536

  def label(ds: Dataset[graft.schema.Turn], maxTurns: Int,
            pplBounds: Option[(Double, Double)] = None,
            maxCollectedGiants: Int = MaxCollectedGiants): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._

    // size census on the RAW input: column pruning reduces the scan to
    // conv_id only; the split happens BEFORE model scoring so each row
    // is scored exactly once (scoring after the split would be shared
    // by census + both branches and recomputed per consumer). The census
    // runs EAGERLY (giant conversations are by definition few, so the
    // id list fits the driver) and each branch filters with an InSet
    // literal — the labeled plan carries no join exchange and no
    // build-side rescan for the split, just the two branch scans.
    // The collect is LIMIT-bounded: a degenerate corpus where "most
    // conversations are giant" must hit the join fallback without ever
    // pulling the unbounded id list to the driver (an unbounded
    // .collect() guarded only AFTERWARDS would OOM first).
    val giantIds = ds.groupBy($"conv_id").agg(count(lit(1)).as("n_turns"))
      .where($"n_turns" > maxTurns).select($"conv_id")
      .limit(maxCollectedGiants + 1)
      .as[String].collect()

    if (giantIds.length > maxCollectedGiants)
      return labelViaJoins(ds, maxTurns, pplBounds)
    labelWithGiants(ds, maxTurns, giantIds, pplBounds)
  }

  /** Label with a PRE-COMPUTED giant-conversation id set — lets a
    * bucketed runner (CheckpointedRun) census the whole corpus ONCE and
    * route each bucket without its own census job; a bucket whose giant
    * set is empty takes the standard path with zero split overhead.
    */
  def labelWithGiants(ds: Dataset[graft.schema.Turn], maxTurns: Int,
                      giantIds: Array[String],
                      pplBounds: Option[(Double, Double)] = None): DataFrame =
    labelWithGiantsScored(QualityFilter.score(ds), maxTurns, giantIds, pplBounds)

  /** The same routing over an ALREADY-SCORED frame — the seam that lets
    * a runner score the corpus exactly once and reuse the scored rows
    * for both the IQR bounds pass and every bucket's labeling
    * (scoring is per-row pure, so score-then-split == split-then-score;
    * the conv_id routing filters push below the scoring projection).
    */
  def labelWithGiantsScored(scored: Dataset[ScoredTurn], maxTurns: Int,
                            giantIds: Array[String],
                            pplBounds: Option[(Double, Double)] = None): DataFrame = {
    import scored.sparkSession.implicits._
    if (giantIds.isEmpty)
      return QualityFilter.labelScored(scored, pplBounds)

    val inGiants = $"conv_id".isin(giantIds.toSeq: _*)
    // null conv_id routes to the normal path (mirrors left_anti, which
    // keeps null keys); isin is null on null input, hence the coalesces
    val normal = scored.where(coalesce(!inGiants, lit(true))).as[ScoredTurn]
    val giant = scored.where(coalesce(inGiants, lit(false))).as[ScoredTurn]

    QualityFilter.labelScored(normal, pplBounds)
      .unionByName(labelGiant(giant, maxTurns, pplBounds))
  }

  /** Join-based split for the degenerate case of MANY giant
    * conversations (id set too large to inline): two joins against the
    * census output. No hard broadcast hint — this path exists
    * precisely because the giant set is large (up to corpus/maxTurns
    * ids), so the broadcast-vs-shuffle call belongs to AQE's runtime
    * size check; the downstream pipeline repartitions by conv_id
    * anyway, so a shuffled semi-join costs no extra exchange shape.
    */
  private[graft] def labelViaJoins(ds: Dataset[graft.schema.Turn], maxTurns: Int,
                                   pplBounds: Option[(Double, Double)] = None): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    // score AFTER the routing joins: each branch then scores only its
    // own rows (a pre-join scoring projection cannot be pushed through
    // the join and would score the full corpus once per branch)
    val sizes = ds.groupBy($"conv_id").agg(count(lit(1)).as("n_turns"))
    val giants = sizes.where($"n_turns" > maxTurns).select($"conv_id")
    val normal = ds.join(giants, Seq("conv_id"), "left_anti")
    val giant = ds.join(giants, Seq("conv_id"), "left_semi")
    QualityFilter.labelScored(QualityFilter.score(normal.as[graft.schema.Turn]), pplBounds)
      .unionByName(labelGiant(QualityFilter.score(giant.as[graft.schema.Turn]),
        maxTurns, pplBounds))
  }

  /** Join-based split over an already-scored frame (see
    * [[labelWithGiantsScored]]). Callers must pass a PERSISTED scored
    * frame — the two routing joins re-evaluate their input, which on an
    * unpersisted frame would re-score the full corpus per branch.
    */
  private[graft] def labelViaJoinsScored(scored: Dataset[ScoredTurn], maxTurns: Int,
                                         pplBounds: Option[(Double, Double)] = None): DataFrame = {
    import scored.sparkSession.implicits._
    val sizes = scored.groupBy($"conv_id").agg(count(lit(1)).as("n_turns"))
    val giants = sizes.where($"n_turns" > maxTurns).select($"conv_id")
    val normal = scored.join(giants, Seq("conv_id"), "left_anti").as[ScoredTurn]
    val giant = scored.join(giants, Seq("conv_id"), "left_semi").as[ScoredTurn]
    QualityFilter.labelScored(normal, pplBounds)
      .unionByName(labelGiant(giant, maxTurns, pplBounds))
  }

  private def eligible = !col("is_empty") &&
    col("norm_len") >= PplMinChars && !(col("role") <=> lit("tool"))

  /** Bucketed-window labeling for giant conversations. Semantics are
    * identical to QualityFilter.labelScored; only the physical window
    * partitioning differs.
    */
  private[pipeline] def labelGiant(scored: Dataset[ScoredTurn], bucketTurns: Int,
                                   pplBounds: Option[(Double, Double)] = None): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._

    val bucketed = scored.withColumn("bkt", floor($"turn_idx" / bucketTurns))

    // windows over the SALTED key — giant conversations split into
    // bounded tasks
    val wBkt = Window.partitionBy($"conv_id", $"bkt").orderBy($"turn_idx")
    val wDup = Window.partitionBy($"conv_id", $"norm_hash").orderBy($"turn_idx")

    val local = bucketed
      .withColumn("dup_rank",
        when($"is_empty", lit(1)).otherwise(row_number().over(wDup)))
      .withColumn("rn_bkt", row_number().over(wBkt))
      .withColumn("prev_idx_l", lag($"turn_idx", 1).over(wBkt))
      .withColumn("prev_ts_l", lag($"ts", 1).over(wBkt))

    // cross-bucket state: last row of each (conv, bucket), lagged over
    // the (tiny) per-bucket table so each bucket sees its predecessor's
    // boundary even across empty buckets (turn_idx gaps)
    val wConvBkt = Window.partitionBy($"conv_id").orderBy($"bkt")
    val boundaries = bucketed
      .groupBy($"conv_id", $"bkt")
      .agg(max(struct($"turn_idx", $"ts")).as("last"))
      .select($"conv_id", $"bkt",
        lag($"last".getField("turn_idx"), 1).over(wConvBkt).as("prev_idx_b"),
        lag($"last".getField("ts"), 1).over(wConvBkt).as("prev_ts_b"),
        lag($"bkt", 1).over(wConvBkt).isNull.as("first_bkt"))

    // boundary value selected by ROW POSITION, not null-coalescing:
    // lag(ts) is null both for "first row of bucket" and "predecessor
    // has null ts" — coalescing would substitute the previous bucket's
    // boundary ts for an in-bucket null predecessor and fire
    // RuleTsRegress where the unsplit path (compare against the
    // immediate predecessor, skip on null) would not
    val withPrev = local
      .join(boundaries, Seq("conv_id", "bkt"))
      .withColumn("is_first", $"first_bkt" && $"rn_bkt" === 1)
      .withColumn("prev_idx", when($"rn_bkt" === 1, $"prev_idx_b").otherwise($"prev_idx_l"))
      .withColumn("prev_ts", when($"rn_bkt" === 1, $"prev_ts_b").otherwise($"prev_ts_l"))

    // language vote: two-phase aggregation (map-side combine soaks the
    // skew) + broadcast join back (few giant conversations)
    val langs = LangId.default.langs
    val voteAggs = langs.toSeq.map(l =>
      sum(when(eligible && $"lang" === l, 1).otherwise(0)).as(s"cnt_$l"))
    val votes = bucketed.groupBy($"conv_id").agg(voteAggs.head, voteAggs.tail: _*)
    val maxCnt = greatest(langs.toSeq.map(l => col(s"cnt_$l")): _*)
    val voteTable = votes.select($"conv_id",
      when(maxCnt > 0, coalesce(langs.toSeq.map(l =>
        when(col(s"cnt_$l") === maxCnt, lit(l))): _*))
        .otherwise(lit("und")).as("conv_lang"))

    val withVote = withPrev.join(broadcast(voteTable), Seq("conv_id"))

    finishLabeling(withVote, pplBounds)
  }

  /** Rule evaluation + scrub — shared semantics, expressed over the
    * prev/first/dup/conv_lang columns whichever path produced them.
    *
    * `pplBounds`: optional data-driven perplexity interval (the IQR
    * variant, QualityFilter.pplIqrBounds) — None keeps the fixed
    * PplMax north-rule default.
    */
  private[graft] def finishLabeling(df: DataFrame,
                                    pplBounds: Option[(Double, Double)] = None): DataFrame = {
    val empty = col("is_empty")
    val notTool = !(col("role") <=> lit("tool"))
    val pplViolation = pplBounds match {
      case Some((lo, hi)) => col("ppl") < lo || col("ppl") > hi
      case None => col("ppl") > PplMax
    }
    val preds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      RuleEmpty -> empty,
      RuleLength -> (!empty && (col("norm_len") < MinLen || col("norm_len") > MaxLen)),
      RuleSymbol -> (!empty && notTool && col("norm_len") >= SymbolDensityMinLen &&
        col("sym_density") > SymbolDensityThreshold),
      RuleRepetition -> (!empty && notTool &&
        col("norm_len") >= RepetitionMinGrams + RepetitionOrder - 1 &&
        col("rep_ratio") < RepetitionDistinctMin),
      RuleBadRole -> (col("role").isNull || !col("role").isin(AllowedRoles.toSeq: _*)),
      RuleBadTool -> ((col("tool").isNotNull &&
        !coalesce(col("role").isin(ToolBearingRoles.toSeq: _*), lit(false))) ||
        (col("role") <=> lit("tool") && col("tool").isNull)),
      RuleNonContiguous -> (when(col("is_first"), col("turn_idx") =!= 0)
        .otherwise(col("turn_idx") =!= col("prev_idx") + 1)),
      RuleTsRegress -> (!col("is_first") && col("ts").isNotNull &&
        col("prev_ts").isNotNull && col("ts") < col("prev_ts")),
      RuleDuplicate -> (!empty && col("dup_rank") > 1),
      RuleLang -> (eligible && !col("lang").isin(AllowedLangs.toSeq: _*) &&
        (col("lang_conf") >= LangDropConf ||
          !col("conv_lang").isin(AllowedLangs.toSeq: _*))),
      RulePpl -> (eligible && pplViolation)
    )
    require(preds.map(_._1) == RuleOrder, "rule order drift vs RuleConfig")

    val reasons = array_compact(array(
      preds.map { case (name, p) => when(p, lit(name)) }: _*))
    val countsMap = map(
      ScrubChain.flatMap { case (rule, _, _) =>
        Seq(lit(rule), col("scrub_struct").getField(s"c_$rule"))
      }: _*)

    df.withColumn("scrub_struct", graft.functions.GraftExpressions.scrub_all(col("text")))
      .withColumn("drop_reasons", reasons)
      .withColumn("keep", size(col("drop_reasons")) === 0)
      .withColumn("scrubbed_text", col("scrub_struct").getField("scrubbed_text"))
      .withColumn("scrub_counts", countsMap)
      .select(
        col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"),
        col("keep"), col("drop_reasons"), col("scrubbed_text"),
        col("lang"), col("lang_conf"), col("ppl"), col("scrub_counts"))
  }
}
