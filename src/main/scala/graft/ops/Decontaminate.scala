package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAlgos

/** Benchmark decontamination: flag (and let the caller drop) corpus
  * documents that share word n-grams with a held-out evaluation set —
  * the standard guard against test-set leakage in training-data
  * pipelines (GPT-3 App. C / Llama-style 8-13-gram overlap checks,
  * here parameterized by `n`).
  *
  * Semantics (shared verbatim by the DuckDB oracle): lowercase, split
  * on whitespace, drop empty tokens (the dd4 tokenization); a
  * document's grams are its DISTINCT consecutive n-token windows
  * joined with single spaces; `n_matched` counts the document's
  * distinct grams that occur anywhere in the benchmark set;
  * `contaminated` = `n_matched >= minMatches`. Documents shorter than
  * `n` tokens (or with null text) have zero grams and are clean.
  *
  * Scale design (the 100 TB lens): real eval suites are tiny next to
  * a training corpus — 10^6-10^7 distinct grams, i.e. an 8-80 MB
  * sorted `Array[Long]` of 64-bit gram fingerprints — so the default
  * path broadcasts the benchmark gram set and the corpus pass is
  * MAP-ONLY: one `mapPartitions` over `(id, text)` computes per-doc
  * match counts with binary search, no shuffle, no text movement, no
  * join. The broadcast is GATED on the counted gram-set size (the
  * dp1 pattern — a hint that bypasses the size check is how
  * broadcasts OOM); an oversized benchmark falls back to a keys-only
  * shuffle join: corpus side explodes to 16-byte `(id, gram-hash)`
  * pairs (never text), inner-joins the gram set, and counts per id.
  * Both paths hash with the same 64-bit fingerprint and dedupe grams
  * per document before counting, so they agree exactly (a divergence
  * needs a 64-bit collision: ~1e-9 at 1e7 grams).
  */
object Decontaminate {

  /** Distinct sorted 64-bit fingerprints of a text's word n-grams —
    * the single tokenization + hashing source for both paths.
    */
  private[graft] def gramHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.emptyLongArray
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = TextAlgos.hash64(sb.toString)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place unique on the sorted array
    var w = 0
    var r = 1
    while (r < out.length) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    java.util.Arrays.copyOf(out, w + 1)
  }

  /** Matches of a doc's sorted-distinct gram hashes against the sorted
    * benchmark array (merge-style walk: both sides sorted).
    */
  private def countMatches(grams: Array[Long], bench: Array[Long]): Int = {
    var i = 0
    var c = 0
    while (i < grams.length) {
      if (java.util.Arrays.binarySearch(bench, grams(i)) >= 0) c += 1
      i += 1
    }
    c
  }

  /** Benchmark-side distinct gram fingerprints as a Dataset[Long]
    * (shuffles only 8-byte hashes; the bench set is small by
    * construction).
    */
  private def benchGramSet(bench: DataFrame, textCol: String, n: Int): Dataset[Long] = {
    val spark = bench.sparkSession
    import spark.implicits._
    bench.select(col(textCol)).as[String]
      .flatMap(t => gramHashes(t, n))
      .distinct()
  }

  /** Per-corpus-document contamination report:
    * `(idCol, n_matched: bigint, contaminated: boolean)` — one row per
    * corpus row, including clean ones (`n_matched = 0`), so the output
    * is a total function of the corpus and the oracle can hash it.
    *
    * `maxBroadcastGrams` gates the broadcast path on the COUNTED
    * benchmark gram-set size; above it the keys-only join fallback
    * runs instead. Default 2^26 grams = a 512 MB long array — sized to
    * executor memory, far above any real eval suite.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, textCol: String,
                    idCol: String, n: Int, minMatches: Int,
                    maxBroadcastGrams: Long = 1L << 26): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minMatches > 0, s"minMatches must be positive, got $minMatches")
    val spark = corpus.sparkSession
    import spark.implicits._
    val grams = benchGramSet(bench, textCol, n)
    // count BEFORE collecting: the gate must trip without materializing
    // an oversized set on the driver
    val nGrams = grams.count()
    val typed = corpus.select(col(idCol).cast("long"), col(textCol))
      .as[(java.lang.Long, String)]
    val counted: DataFrame =
      if (nGrams <= maxBroadcastGrams) {
        val benchArr = grams.collect()
        java.util.Arrays.sort(benchArr)
        val bc = spark.sparkContext.broadcast(benchArr)
        typed.mapPartitions { it =>
          val arr = bc.value
          it.map { case (id, text) =>
            (id, countMatches(gramHashes(text, n), arr).toLong)
          }
        }.toDF(idCol, "n_matched")
      } else {
        // fallback: 16-byte (id, hash) pairs ride the shuffle, never
        // text; per-doc gram dedup already happened in gramHashes
        val pairs = typed.flatMap { case (id, text) =>
          gramHashes(text, n).map(h => (id, h))
        }.toDF(idCol, "h")
        val matched = pairs.join(grams.toDF("h"), Seq("h"))
          .groupBy(col(idCol)).agg(count(lit(1)).as("n_matched"))
        typed.toDF(idCol, "text").select(col(idCol))
          .join(matched, Seq(idCol), "left")
          .select(col(idCol), coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      }
    counted.select(col(idCol), col("n_matched"),
      (col("n_matched") >= minMatches).as("contaminated"))
  }
}
