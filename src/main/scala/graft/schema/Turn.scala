package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Input row of the transcript corpus.
  *
  * Shape per BASELINE.json input_hint: an Iceberg-layout table of
  * multi-turn conversation / agent transcripts. Row identity is
  * `(conv_id, turn_idx)` — the analog of the reference's synthetic
  * `{table}_id` primary key (reference: DataGuardianApp/utils.py:730-734)
  * but stable across partitioning, which `monotonically_increasing_id`
  * is not.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** A turn annotated with model scores (language-ID + perplexity) and
  * per-turn text metrics — everything per-row the conversation windows
  * need, produced by the fused scoring projection (ScoreAllExpr;
  * per-executor dense model tables). Deliberately SLIM: the normalized text itself is NOT
  * carried (only its 64-bit hash, length, and derived metrics), because
  * these rows ride through the window-stage sorts; at 32 concurrent
  * sort tasks the stage is memory-bandwidth-bound and every byte per
  * row costs wall-clock. The normalized text is recomputed by two
  * codegen'd regexes in the final projection (CPU is cheap there).
  */
final case class ScoredTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    lang: String,
    lang_conf: Double,
    ppl: Double,
    norm_len: Int,
    norm_hash: Long,
    is_empty: Boolean,
    sym_density: Double,
    rep_ratio: Double
)

/** Output row: keep/drop label + scrubbed text + lineage.
  *
  * The per-turn `drop_reasons` array is the vectorized analog of the
  * reference's one-ORM-row-per-anomaly `DiagnosticDetail` log
  * (reference: DataGuardianApp/models.py:202-215, inserted row-at-a-time
  * at utils.py:1114-1129).
  */
final case class LabeledTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    keep: Boolean,
    drop_reasons: Seq[String],
    scrubbed_text: String,
    lang: String,
    lang_conf: Double,
    ppl: Double,
    scrub_counts: Map[String, Int]
)

object Turn {
  val schema: StructType = StructType(
    Seq(
      StructField("conv_id", StringType),
      StructField("turn_idx", IntegerType),
      StructField("role", StringType),
      StructField("text", StringType),
      StructField("tool", StringType),
      StructField("ts", TimestampType)
    )
  )
}
