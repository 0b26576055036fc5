package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions.{ngram_jaccard, sim_hash}
import graft.functions.TextAlgos

/** Large-scale deduplication operators for training-data pipelines.
  *
  * Scale design: every variant shuffles only (id, key/signature)
  * columns, never the full text twice; candidate generation is a
  * band-bucket self-join (the classic MinHash-LSH layout) so the
  * all-pairs O(n²) never materializes. Exact dedup = hash-groupBy (one
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

  private val minHashUdf =
    udf((text: String, numHashes: Int, k: Int) =>
      TextAlgos.minHashSignature(TextAlgos.shingles(text, k), numHashes))

  /** MinHash + LSH near-duplicate PAIRS.
    *
    * shingle(k words) → minhash(numHashes) → split signature into
    * `bands` bands → band-bucket self-join → verify candidates with
    * word-shingle Jaccard ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, deduped. The
    * band-bucket join shuffles only (bucket-hash, id); text is joined
    * back just for the verify step.
    */
  def minHashPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleK: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val sig = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), col(textCol).as("txt"),
        minHashUdf(col(textCol), lit(numHashes), lit(shingleK)).as("sig"))

    // one row per (band, bucket-hash, id)
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .select(col("pos").as("band"), col("col").as("bucket"), col("id"))

    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val withText = cand
      .join(sig.select(col("id").as("id_a"), col("txt").as("txt_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("txt").as("txt_b")), Seq("id_b"))

    withText
      .select(col("id_a"), col("id_b"),
        ngram_jaccard(col("txt_a"), col("txt_b"), shingleK).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash, candidates share at least
    * one of four 16-bit chunks (catches Hamming distance ≤ 3 by
    * pigeonhole), verified by true Hamming distance.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df
      .where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), sim_hash(col(textCol)).as("sig"))
    val chunked = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .select(col("id"), col("sig"), col("pos").as("chunk"), col("col").as("ckey"))
    val ham = chunked.as("l").join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") &&
        col("l.ckey") === col("r.ckey") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
    ham.where(col("hamming") <= maxHamming)
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
