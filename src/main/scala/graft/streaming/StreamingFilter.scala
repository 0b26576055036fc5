package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.pipeline.{QualityFilter, SkewSplit}
import graft.schema.Turn

/** Structured Streaming front-end for the quality filter.
  *
  * The reference is strictly request-scoped batch and the north rule is
  * batch with snapshot resume (SURVEY.md §2.9), so streaming is a
  * CAPABILITY wrapper, not the primary path. Semantics: the per-turn
  * STATELESS rule subset (sentinels, length, symbol density,
  * repetition, role/tool dictionary, turn-confidence language, ppl) +
  * the full PII scrub chain. Conversation-scoped rules (contiguity,
  * ts-regression, in-conversation dedup, conversation vote) need
  * cross-row state per conv_id and are the batch pipeline's job; here
  * their state columns are pinned to neutral values so the shared rule
  * evaluator never fires them (and the turn-level language rule drops
  * only on its own confidence).
  *
  * The scoring pass (broadcast models, mapPartitions) is the same code
  * as batch — mapPartitions is streaming-safe (no state).
  */
object StreamingFilter {

  /** readStream(Dataset[Turn]) → labeled stream (stateless subset). */
  def label(stream: Dataset[Turn]): DataFrame = {
    val scored = QualityFilter.score(stream)
    val neutral = scored
      .withColumn("is_first", lit(false))
      .withColumn("prev_idx", col("turn_idx") - 1)
      .withColumn("prev_ts", lit(null).cast("timestamp"))
      .withColumn("dup_rank", lit(1))
      .withColumn("conv_lang", lit(graft.rules.RuleConfig.AllowedLangs.min))
    SkewSplit.finishLabeling(neutral)
  }

  /** Event-time metrics stream: kept/dropped counts per 5-minute
    * window with a 10-minute watermark (late rows beyond the watermark
    * are dropped from the aggregation, standard streaming semantics).
    */
  def metrics(labeled: DataFrame): DataFrame =
    labeled
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("keep"))
      .agg(count(lit(1)).as("n_turns"),
        sum(size(col("drop_reasons"))).as("n_reasons"))
}
