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
  * Plan shape: one mapPartitions scoring pass (broadcast models); exact
  * dedup shuffles ONLY (xxhash64(text), doc_id) — non-first ids per
  * hash come back as a tiny flag table (the `exactSurvivors` shape,
  * Dedup.scala), so the full-text rows never ride the dedup exchange;
  * near-dup ids come from the MinHash band join (also keys-only).
  * Both flag tables join back on doc_id in ONE left join (they are
  * unioned first — dup/near-dup id lists are small relative to the
  * corpus, and AQE broadcasts them when they fit). Everything else is
  * codegen'd columns.
  */
object DocPipeline {

  /** One-slot cache handle bounding the flags-table persist (see
    * labelScored): each call releases the previous call's relation, so
    * repeated invocations in a long-lived session never accumulate
    * pinned storage beyond the latest flags table.
    *
    * CONCURRENCY CAVEAT: the slot is process-global, so concurrent
    * [[labelScored]] calls unpersist each other's flags mid-query. That
    * is a perf hazard only (the dominant LSH subtree recomputes), never
    * a correctness one — but a multi-tenant driver should serialize
    * labelScored calls. Call [[releaseFlagsCache]] when done with the
    * last returned frame to unpin the final relation.
    */
  @transient private var previousFlags: Option[DataFrame] = None
  private def releasePreviousFlags(current: DataFrame): Unit = synchronized {
    previousFlags.foreach(_.unpersist(blocking = false))
    previousFlags = Some(current)
  }

  /** Unpin the last labelScored call's flags relation (otherwise it
    * stays cached for the JVM lifetime). Safe to call once the caller
    * has finished acting on the returned frame.
    */
  def releaseFlagsCache(): Unit = synchronized {
    previousFlags.foreach(_.unpersist(blocking = false))
    previousFlags = None
  }

  final case class DocConfig(
      minTokens: Int = 5,
      maxSymbolRatio: Double = 0.3,
      minQuality: Double = 0.3,
      allowedLangs: Set[String] = RuleConfig.AllowedLangs,
      langConfMin: Double = 0.65,
      nearDupThreshold: Double = 0.85,
      // broadcast the dup/near-dup flag table only below this COUNTED
      // row bound (~32 MB of ids) — on a high-duplication corpus the
      // flag table is O(corpus) and a hard broadcast hint would bypass
      // AQE's size check and OOM the driver
      maxBroadcastFlags: Long = 4L << 20)

  /** Stage 1: broadcast-model language-ID + perplexity per document —
    * the persisted seam the driver's DuckDB oracle re-labels from
    * (every downstream rule is SQL-expressible; the model scores are
    * not).
    */
  def score(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scorerBc = spark.sparkContext.broadcast(graft.lm.TurnScorer.default)
    docs.select(col(idCol).cast("long").as("doc_id"),
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
  }

  /** Duplicate-flag table: doc_ids that are NOT the first (min-id)
    * occurrence of their exact text. Only (hash, id) flows through the
    * aggregation — the Dedup.exactSurvivors shape inverted to return
    * the (small) non-survivor side.
    */
  def exactDupIds(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keyed = docs.select(xxhash64(col(textCol)).as("k"), col(idCol).cast("long").as("doc_id"))
    keyed
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
      .where(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
  }

  /** Stage 2: rules + scrub over the scored rows plus the two flag-id
    * tables. Pure Catalyst columns — mirrored 1:1 by the DuckDB oracle.
    */
  def labelScored(scored: DataFrame, exactDups: DataFrame, nearDups: DataFrame,
                  cfg: DocConfig = DocConfig()): DataFrame = {
    val flags = exactDups.select(col("doc_id"), lit(true).as("is_exact_dup"),
        lit(null).cast("boolean").as("is_near_dup"))
      .unionByName(nearDups.select(col("doc_id"),
        lit(null).cast("boolean").as("is_exact_dup"), lit(true).as("is_near_dup")))
      .groupBy(col("doc_id"))
      .agg(max(col("is_exact_dup")).as("is_exact_dup"),
        max(col("is_near_dup")).as("is_near_dup"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // at most ONE pinned flags relation per JVM: the previous call's
    // cache is released here (there is no safe in-call unpersist point
    // — the caller acts on the returned frame later, and dropping the
    // persist entirely would re-execute the near-dup LSH subtree, the
    // pipeline's dominant cost, once for the gate count and again for
    // the join)
    releasePreviousFlags(flags)

    // broadcast GATED on the counted size (cfg.maxBroadcastFlags): on a
    // typical corpus the flag table is tiny and the hint keeps full-text
    // rows out of any join exchange; on a pathological high-duplication
    // corpus it is O(corpus) rows and the hint would force an OOM-risk
    // broadcast past AQE's size check — there the plain left join (AQE
    // decides) is the only correct plan. The count runs on the cached
    // relation, so the dup subtrees execute exactly once.
    val flagsJoin =
      if (flags.count() <= cfg.maxBroadcastFlags) broadcast(flags) else flags

    val quality = TextStats.qualityScoreCol(col("text"))
    val reasons = array_compact(array(
      when(col("text").isNull || trim(col("text")) === "", lit("empty")),
      when(TextStats.tokenCountCol(col("text")) < cfg.minTokens, lit("too_short")),
      when(TextStats.symbolRatioCol(col("text")) > cfg.maxSymbolRatio, lit("symbol_noise")),
      when(quality < cfg.minQuality, lit("low_quality")),
      when(!col("lang").isin(cfg.allowedLangs.toSeq: _*) &&
        col("lang_conf") >= cfg.langConfMin, lit("lang")),
      when(coalesce(col("is_exact_dup"), lit(false)), lit("exact_dup")),
      when(coalesce(col("is_near_dup"), lit(false)), lit("near_dup"))))

    val scrubStruct = graft.functions.GraftExpressions.scrub_all(col("text"))

    scored
      .join(flagsJoin, Seq("doc_id"), "left")
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

  /** Near-dup-flag table from the MinHash-LSH verified pairs: any doc
    * appearing as the LARGER id of a pair is a near-dup of an earlier
    * doc.
    */
  def nearDupIds(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 threshold: Double = DocConfig().nearDupThreshold): DataFrame =
    Dedup.minHashPairs(docs.select(col(idCol), col(textCol)).toDF(idCol, textCol),
        textCol, idCol, threshold = threshold)
      .select(col("id_b").cast("long").as("doc_id")).distinct()

  def label(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            cfg: DocConfig = DocConfig()): DataFrame =
    labelScored(
      score(docs, idCol, textCol),
      exactDupIds(docs, idCol, textCol),
      nearDupIds(docs, idCol, textCol, cfg.nearDupThreshold),
      cfg)
}
