package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.{min_hash_sig, ngram_jaccard, sim_hash}

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Scale design: every variant shuffles only (id, key/signature)
  * columns, never text; candidate generation is groupBy(band, bucket) →
  * collect ids → in-bucket pair expansion (the classic MinHash-LSH
  * layout), so the all-pairs O(n²) never materializes AND the signature
  * stage runs exactly once per document (the round-1 band-bucket
  * self-join evaluated the signature expression on both sides).
  * Degenerate hot buckets (boilerplate/near-empty docs sharing a band
  * signature) are capped: ids above `maxBucket` are truncated — the
  * kept sample still links the near-identical cluster transitively —
  * and the truncation is surfaced as observed metrics
  * (`capped_buckets`, `dropped_ids`). Exact dedup = hash-groupBy (one
  * shuffle of 16-byte rows).
  */
object Dedup {

  /** Exact dedup: survivors are the min-id row per distinct key. Only
    * (hash(key), id) flows through the shuffle; full rows are recovered
    * with a semi-join on id (Parquet column pruning keeps the first scan
    * narrow).
    */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.select(xxhash64(col(textCol)).as("k"), col(idCol))
    val winners = keyed.groupBy(col("k")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Exact-dedup summary: total rows vs distinct texts. */
  def exactStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(textCol)).as("n_unique"))

  /** All ordered pairs (element i, element j>i) of a sorted array column
    * as array<struct<id_a, id_b>> — pure higher-order functions, no udf.
    */
  private def pairCombos(ids: Column): Column =
    flatten(transform(ids, (a, i) =>
      transform(slice(ids, i + lit(2), size(ids) - i - 1),
        b => struct(a.as("id_a"), b.as("id_b")))))

  /** groupBy(band-key) → sorted id list → cap → pair expansion. Shared
    * candidate-generation tail for every LSH variant. `ids` may be a
    * struct column (sorted by its first field).
    */
  private[ops] def lshBucketPairs(banded: DataFrame, keyCols: Seq[String],
                                  idCol: Column, maxBucket: Int, metricPrefix: String): DataFrame = {
    // Perf note (round-5 profiling): the observe/CollectMetrics node
    // here is FREE at steady state — a warm-JIT A/B on a 64M-row
    // banded input measured observe-on vs observe-off vs a slimmed
    // metrics projection all within noise (~55 s each); an apparent
    // 2x observe cost in earlier cold runs was first-execution JIT.
    val buckets = banded
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(idCol)).as("ids"))
      .where(size(col("ids")) >= 2)
      .observe(s"${metricPrefix}_buckets",
        sum(when(size(col("ids")) > maxBucket, 1).otherwise(0)).as("capped_buckets"),
        sum(when(size(col("ids")) > maxBucket, size(col("ids")) - maxBucket)
          .otherwise(0)).as("dropped_ids"))
    buckets
      .select(explode(pairCombos(
        when(size(col("ids")) > maxBucket, slice(col("ids"), 1, maxBucket))
          .otherwise(col("ids")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
  }

  /** MinHash + LSH near-duplicate PAIRS.
    *
    * shingle(k words) → minhash(numHashes) → split signature into
    * `bands` bands → (band, bucket) grouping → in-bucket pairs (capped
    * at `maxBucket` ids per bucket) → verify candidates with
    * word-shingle Jaccard ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, deduped. Only
    * (band, bucket-hash, id) flows through the LSH shuffle; text is
    * joined back just for the verify step, after pair dedup.
    */
  def minHashPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleK: Int = 3, threshold: Double = 0.7,
                   maxBucket: Int = 256): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val base = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), col(textCol).as("txt"))

    // one row per (band, bucket-hash, id); the signature expression runs
    // exactly once per document — it lives in its own projection (an
    // attribute referenced `bands` times is not inlined by
    // CollapseProject), and the band hashes are a plain literal-indexed
    // array so the whole stage stays in codegen
    val banded = base
      .select(col("id"), min_hash_sig(col("txt"), numHashes, shingleK).as("sig"))
      .select(col("id"), posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)))
      .select(col("pos").as("band"), col("col").as("bucket"), col("id"))

    val cand = lshBucketPairs(banded, Seq("band", "bucket"), col("id"), maxBucket, "dd2")
      .distinct()

    val withText = cand
      .join(base.select(col("id").as("id_a"), col("txt").as("txt_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("txt").as("txt_b")), Seq("id_b"))

    withText
      .select(col("id_a"), col("id_b"),
        ngram_jaccard(col("txt_a"), col("txt_b"), shingleK).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash, chunk count derived as
    * maxHamming + 1 so the pigeonhole recall guarantee ("a pair within
    * maxHamming shares at least one unchanged chunk") actually covers
    * the requested radius (round 1 fixed 4 chunks, which only
    * guarantees distance ≤ 3). Signatures ride the bucket shuffle as a
    * struct (16 bytes/row) so the Hamming verify needs no join-back.
    *
    * Recall is exact ONLY while no (chunk, key) bucket exceeds
    * `maxBucket`: larger maxHamming narrows the chunks (9 chunks →
    * 7-8-bit keys), making hot buckets likelier, and a truncated bucket
    * drops the pairs whose only shared chunk it was (truncations are
    * surfaced via the observed `dd3_buckets` metrics). Pass
    * Int.MaxValue when exactness matters more than the skew bound.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val nChunks = maxHamming + 1
    require(nChunks >= 1 && nChunks <= 64, "maxHamming must be in [0, 63]")
    val sigs = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), sim_hash(col(textCol)).as("sig"))
    // chunk i covers bits [i*64/n, (i+1)*64/n) — widths differ by ≤ 1
    val chunkCols = (0 until nChunks).map { i =>
      val lo = i * 64 / nChunks
      val hi = (i + 1) * 64 / nChunks
      val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1L
      shiftrightunsigned(col("sig"), lo).bitwiseAND(lit(mask))
    }
    val chunked = sigs
      .select(struct(col("id"), col("sig")).as("is"), posexplode(array(chunkCols: _*)))
      .select(col("pos").as("chunk"), col("col").as("ckey"), col("is"))

    lshBucketPairs(chunked, Seq("chunk", "ckey"), col("is"), maxBucket, "dd3")
      .select(col("id_a.id").as("id_a"), col("id_b.id").as("id_b"),
        bit_count(col("id_a.sig").bitwiseXOR(col("id_b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** One text document per conversation: turns concatenated in
    * turn_idx order (array_sort on (turn_idx, text) structs — pure
    * codegen, no window). Feed the result to [[minHashPairs]] for
    * CONVERSATION-level near-dup detection — the transcript analog of
    * document dedup.
    *
    * Scale note: forming conversation documents is one groupBy(conv_id)
    * shuffle of the text — inherent to the definition. At the 10^12-turn
    * tier, run it on the already-conv-partitioned output of the quality
    * filter (no extra exchange), or push the MinHash down to turn level:
    * min-combining per-turn signatures equals the signature of the
    * shingle-set union (only boundary-crossing shingles are lost), which
    * shuffles 64 longs per conversation instead of its full text.
    */
  def conversationText(turns: DataFrame, convCol: String = "conv_id",
                       idxCol: String = "turn_idx", textCol: String = "text"): DataFrame =
    turns.groupBy(col(convCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(idxCol), col(textCol).as("t")))),
        x => x.getField("t")), " ").as("conv_text"))

  /** Conversation-level near-dup WITHOUT shuffling text — the 10^12-turn
    * path promised in [[conversationText]]'s scale note:
    *
    *  1. per-turn MinHash signatures (map-side, codegen expression);
    *  2. element-wise min per conversation (numHashes longs per turn
    *     ride the shuffle instead of the text — min is associative/
    *     commutative, so partial aggregation applies, and
    *     min-of-turn-minhashes == minhash of the UNION of the turns'
    *     shingle sets; only turn-boundary-crossing shingles are
    *     unrepresented);
    *  3. banded bucket join over the combined signatures (capped, as
    *     everywhere);
    *  4. EXACT verify on candidates only: conversation text is built
    *     just for candidate conversations (left-semi on the tiny
    *     candidate id set), so the final jaccard matches
    *     [[conversationText]]+[[minHashPairs]] semantics while the
    *     full-corpus stages never touch concatenated text.
    */
  def conversationMinHashPairs(turns: DataFrame, convCol: String = "conv_id",
                               idxCol: String = "turn_idx", textCol: String = "text",
                               numHashes: Int = 64, bands: Int = 16,
                               shingleK: Int = 3, threshold: Double = 0.7,
                               maxBucket: Int = 256): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val perTurn = turns
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(convCol).as("cid"),
        min_hash_sig(col(textCol), numHashes, shingleK).as("sig"))
    val convSig = perTurn.groupBy(col("cid"))
      .agg(array((0 until numHashes).map(i =>
        min(get(col("sig"), lit(i)))): _*).as("sig"))
    val banded = convSig
      .select(col("cid"), posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows), lit(b))): _*)))
      .select(col("pos").as("band"), col("col").as("bucket"), col("cid"))
    // Candidate volume is governed by the LSH s-curve
    // P(candidate at similarity s) = 1 - (1 - s^r)^b with
    // r = numHashes/bands rows per band. The original default (b=32,
    // r=2) made one band collision a weak signal — at s=0.2 the
    // collision rate is 1-(1-0.04)^32 ≈ 73%, and a 2M-conversation
    // soak corpus measured 8.1M candidate pairs for 13 true near-dups.
    // The default is now b=16, r=4 (same 64 hashes): recall at the 0.7
    // verify threshold stays ≈ 1-(1-0.24)^16 ≈ 0.99 (and ≈ 1 for the
    // high-jaccard pairs near-dup rules exist for) while the s=0.2
    // collision rate drops to 1-(1-0.0016)^16 ≈ 2.5% — measured 387×
    // fewer candidates at identical recall on the soak corpus
    // (SCALE.md's banding table). A signature-estimate prefilter (join the 64-long
    // combined sigs back to the pairs, keep fraction-equal ≥
    // threshold-5σ) was tried and REVERTED before the re-banding: on
    // short conversations the 512 B signature per pair side costs MORE
    // shuffle than the conversation text it saves (cnd soak 269 s →
    // 345-425 s at b=32). The text stage stays bounded either way:
    // `maxBucket` caps per-bucket expansion (with truncation observed
    // as metrics), and conversations join in DISTINCT — candidates pay
    // in 16-byte pair rows, not text. Callers needing the exact-
    // agreement regime (recall ≈ 1 down to low jaccard, e.g. the
    // cd1/cd2 parity queries) pass bands=32 explicitly.
    val cand = lshBucketPairs(banded, Seq("band", "bucket"), col("cid"),
        maxBucket, "cd2")
      .distinct()
    // candidate id set: tiny on a typical corpus, but O(#convs) when
    // most conversations are near-dups of something — no hard
    // broadcast hint (it would bypass AQE's size check and risk OOM at
    // the 10^12-turn tier); AQE broadcasts the semi-join build side
    // when its runtime size allows
    val candIds = cand.select(col("id_a").as("cid"))
      .unionByName(cand.select(col("id_b").as("cid"))).distinct()
    val candTurns = turns.join(candIds,
      turns(convCol) === candIds("cid"), "left_semi")
    val candText = conversationText(candTurns, convCol, idxCol, textCol)
    cand
      .join(candText.select(col(convCol).as("id_a"), col("conv_text").as("ta")), Seq("id_a"))
      .join(candText.select(col(convCol).as("id_b"), col("conv_text").as("tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        ngram_jaccard(col("ta"), col("tb"), shingleK).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** N-gram Jaccard between explicit row pairs (consecutive ids) — the
    * exhaustive small-scale verifier used in tests and as a DuckDB-
    * checkable query (char-set Jaccard variant lives in SparkEntry).
    */
  def consecutiveJaccard(df: DataFrame, textCol: String, idCol: String,
                         shingleK: Int = 2): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(textCol).as("txt_a"))
    val b = df.select((col(idCol) - 1).as("id_a"), col(idCol).as("id_b"),
      col(textCol).as("txt_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        round(ngram_jaccard(col("txt_a"), col("txt_b"), shingleK), 6).as("jaccard"))
  }
}
