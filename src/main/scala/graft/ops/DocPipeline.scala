package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.doc_fingerprint
import graft.rules.RuleConfig

/** End-to-end training-data cleaning over a DOCUMENT corpus (the
  * documents-table counterpart of the transcript quality filter):
  * language-ID + heuristic quality + PII scrub + exact-dup and
  * near-dup flags, one labeled output row per document.
  *
  * Plan shape: one mapPartitions scoring pass (broadcast models), exact
  * dedup as a window over (text-hash) — first occurrence survives —
  * and near-dup candidates from the MinHash band join, flagged back via
  * a left-semi-ish aggregation on doc id. Everything else is codegen'd
  * columns.
  */
object DocPipeline {

  final case class DocConfig(
      minTokens: Int = 5,
      maxSymbolRatio: Double = 0.3,
      minQuality: Double = 0.3,
      allowedLangs: Set[String] = RuleConfig.AllowedLangs,
      langConfMin: Double = 0.65,
      nearDupThreshold: Double = 0.85)

  def label(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            cfg: DocConfig = DocConfig()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // broadcast-model language-ID (same scorer as the transcript path)
    val scorerBc = spark.sparkContext.broadcast(graft.lm.TurnScorer.default)
    val scored = docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val scorer = scorerBc.value
        it.map { case (id, text) =>
          val norm = graft.scrub.Scrub.normalizeWsPlain(text)
          val (lang, conf, ppl) = scorer.score(norm)
          (id, text, lang, conf, ppl)
        }
      }.toDF("doc_id", "text", "lang", "lang_conf", "ppl")

    // exact-dup rank: first doc id per text hash survives
    val wHash = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("text"))).orderBy(col("doc_id"))
    val withDup = scored.withColumn("dup_rank", row_number().over(wHash))

    // near-dup flags from MinHash-LSH pairs: any doc appearing as the
    // LARGER id of a verified pair is a near-dup of an earlier doc
    val nearDups = Dedup.minHashPairs(docs.select(col(idCol), col(textCol)).toDF(idCol, textCol),
        textCol, idCol, threshold = cfg.nearDupThreshold)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_near_dup", lit(true))

    val quality = TextStats.qualityScoreCol(col("text"))
    val reasons = array_compact(array(
      when(col("text").isNull || trim(col("text")) === "", lit("empty")),
      when(TextStats.tokenCountCol(col("text")) < cfg.minTokens, lit("too_short")),
      when(TextStats.symbolRatioCol(col("text")) > cfg.maxSymbolRatio, lit("symbol_noise")),
      when(quality < cfg.minQuality, lit("low_quality")),
      when(!col("lang").isin(cfg.allowedLangs.toSeq: _*) &&
        col("lang_conf") >= cfg.langConfMin, lit("lang")),
      when(col("dup_rank") > 1, lit("exact_dup")),
      when(coalesce(col("is_near_dup"), lit(false)), lit("near_dup"))))

    val scrubStruct = graft.functions.GraftExpressions.scrub_all(col("text"))

    withDup
      .join(nearDups, Seq("doc_id"), "left")
      .withColumn("drop_reasons", reasons)
      .withColumn("keep", size(col("drop_reasons")) === 0)
      .withColumn("scrubbed_text", scrubStruct.getField("scrubbed_text"))
      .withColumn("quality", round(quality, 6))
      .withColumn("fingerprint", doc_fingerprint(col("text")))
      .select(col("doc_id"), col("keep"), col("drop_reasons"),
        col("lang"), round(col("lang_conf"), 4).as("lang_conf"),
        round(col("ppl"), 4).as("ppl"), col("quality"),
        col("fingerprint"), col("scrubbed_text"))
  }
}
