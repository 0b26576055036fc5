package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAlgos
import graft.ops.{Ann, Dedup}

/** Dedup + ANN operators vs brute-force ground truth on small inputs. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf = {
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
      (3L, "completely unrelated sentence about spark window aggregation plans"),
      (4L, "spark window aggregation plans are completely unrelated here too"),
      (5L, "der schnelle braune fuchs springt ueber den faulen hund am fluss"),
      (6L, "the quick brown fox leaps over the lazy dog near the river bank"),
      (7L, "short"),
      (8L, ""),
      (9L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    base.toDF("doc_id", "text")
  }

  test("exact dedup keeps min-id survivor per distinct text") {
    val survivors = Dedup.exactSurvivors(docsDf, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(0L, 1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L)) // 2 deduped
    val stats = Dedup.exactStats(docsDf, "text").head()
    assert(stats.getLong(0) == 10 && stats.getLong(1) == 9)
  }

  test("minhash LSH finds near-dup pairs that brute force finds") {
    val pairs = Dedup.minHashPairs(docsDf, "text", "doc_id",
        numHashes = 128, bands = 32, shingleK = 2, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force ground truth at the same threshold
    val rows = docsDf.collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib && tb.nonEmpty && ta.nonEmpty
      if TextAlgos.ngramJaccard(ta, tb, 2) >= 0.6
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty)
    // exact-dup pair must be found; high recall on this tiny set
    assert(pairs.contains((0L, 2L)))
    assert((truth -- pairs).size <= truth.size / 3,
      s"LSH missed too many: ${truth -- pairs}")
    assert(pairs.subsetOf(truth), "verify step must kill false positives")
  }

  test("simhash pairs include exact duplicates at hamming 0") {
    val pairs = Dedup.simHashPairs(docsDf, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 0))
  }

  test("brute-force ANN matches driver-side cosine ranking") {
    import spark.implicits._
    val rng = new TranscriptRng(7)
    val vecs = (0L until 50L).map(i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat).toSeq)).toDF("vec_id", "embedding")
    val topk = Ann.bruteForceTopK(vecs, vecs.where(col("vec_id") < 3), k = 5, roundTo = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val raw = vecs.as[(Long, Seq[Float])].collect().toMap
    (0L until 3L).foreach { q =>
      val expect = raw.keys.filter(_ != q).toSeq
        .map(n => (n, TextAlgos.cosine(raw(q).toArray, raw(n).toArray)))
        .sortBy { case (n, s) => (-s, n) }.take(5).map(_._1)
      assert(topk(q).map(_._2).toSeq == expect)
    }
  }

  test("LSH ANN recall vs brute force on clustered vectors") {
    import spark.implicits._
    val rng = new TranscriptRng(11)
    // 5 well-separated centers with jittered members → LSH-friendly
    val centers = Array.fill(5, 16)(rng.nextGaussian() * 5)
    val vecs = (0L until 100L).map { i =>
      val c = centers((i % 5).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val brute = Ann.bruteForceTopK(vecs, vecs.where(col("vec_id") < 5), k = 3, roundTo = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(vecs, vecs.where(col("vec_id") < 5), k = 3,
      tables = 8, bits = 6, roundTo = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall too low")
  }

  test("IVF ANN recall vs brute force on clustered vectors") {
    import spark.implicits._
    val rng = new TranscriptRng(17)
    val centers = Array.fill(6, 16)(rng.nextGaussian() * 5)
    val vecs = (0L until 120L).map { i =>
      val c = centers((i % 6).toInt)
      (i, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val brute = Ann.bruteForceTopK(vecs, vecs.where(col("vec_id") < 6), k = 3, roundTo = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(vecs, vecs.where(col("vec_id") < 6), k = 3,
      nCells = 8, nProbe = 3, roundTo = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
    // determinism
    val ivf2 = Ann.ivfTopK(vecs.repartition(5), vecs.where(col("vec_id") < 6), k = 3,
      nCells = 8, nProbe = 3, roundTo = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == ivf2)
  }

  test("hot bucket: 10k identical docs complete without quadratic pair blowup") {
    import spark.implicits._
    // 10k exact duplicates all share every band signature — uncapped LSH
    // would expand ~50M candidate pairs in one task
    val cap = 64
    val docs = (0L until 10000L)
      .map(i => (i, "boilerplate header repeated across the whole crawl"))
      .toDF("doc_id", "text")
    val n = Dedup.minHashPairs(docs, "text", "doc_id",
      numHashes = 32, bands = 8, shingleK = 2, threshold = 0.5,
      maxBucket = cap).count()
    assert(n > 0 && n <= cap.toLong * (cap - 1) / 2,
      s"capped bucket emitted $n pairs")
    val nSim = Dedup.simHashPairs(docs, "text", "doc_id",
      maxHamming = 3, maxBucket = cap).count()
    assert(nSim > 0 && nSim <= cap.toLong * (cap - 1) / 2)
  }

  test("hot bucket: lshTopK caps degenerate corpus buckets") {
    import spark.implicits._
    // 10k IDENTICAL embeddings hash into one bucket per table — the
    // round-2 top-k joined queries × full bucket; the cap bounds each
    // query's candidate set at tables × maxBucket
    val cap = 64
    val vec = Array.tabulate(16)(i => (i + 1).toFloat / 16f)
    val corpus = (0L until 10000L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val queries = (20000L until 20010L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val topk = Ann.lshTopK(corpus, queries, k = 5, tables = 4, bits = 8,
      maxBucket = cap)
    val rows = topk.collect()
    assert(rows.length == 10 * 5, s"expected 50 top-k rows, got ${rows.length}")
    // identical vectors → cosine 1.0 everywhere; deterministic min-id winners
    assert(rows.forall(_.getDouble(2) == 1.0))
    // candidate set per query bounded by tables × cap, so the k results
    // must come from the sorted-prefix sample (smallest ids)
    assert(rows.forall(_.getLong(1) < cap))
  }

  test("simhash pairs == brute force at maxHamming 8 (chunk count derived)") {
    import spark.implicits._
    // word-swapped variants of a base sentence → intermediate hamming
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    val rng = new TranscriptRng(23)
    val docs = (0L until 60L).map { i =>
      val toks = (0 until 12).map { j =>
        if (rng.nextDouble() < 0.15) words((j + 1 + (rng.nextDouble() * 11).toInt) % 12)
        else words(j)
      }
      (i, toks.mkString(" "))
    }
    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      h = java.lang.Long.bitCount(TextAlgos.simHash(ta) ^ TextAlgos.simHash(tb))
      if h <= 8
    } yield (ia, ib, h)).toSet
    assert(truth.exists(p => p._3 >= 4 && p._3 <= 8),
      "fixture must exercise the 4-8 hamming range the round-1 4-chunk LSH missed")
    val got = Dedup.simHashPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == truth, s"missed: ${truth -- got}; extra: ${got -- truth}")
  }

  /** Deterministic gaussian-ish RNG for test vectors. */
  private final class TranscriptRng(seed: Long) {
    private var s = seed
    def nextDouble(): Double = {
      s = TextAlgos.mix64(s); (s >>> 11).toDouble / (1L << 53).toDouble
    }
    def nextGaussian(): Double = {
      // Box-Muller, deterministic
      val u1 = math.max(nextDouble(), 1e-12); val u2 = nextDouble()
      math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    }
  }

  test("conversation near-dup: text-free signature path == text path") {
    import spark.implicits._
    // different seed and clone pattern than the driver query fixture
    val base = graft.gen.TranscriptGen.generate(spark, 150, seed = 7L, skewCap = 200).toDF()
    val clones = base
      .where(pmod(xxhash64(col("conv_id")), lit(7)) === 1)
      .withColumn("conv_id", concat(lit("x"), col("conv_id")))
      .withColumn("text",
        when(col("turn_idx") % 5 === 2, concat(col("text"), lit(" altered bit")))
          .otherwise(col("text")))
    val turns = base.unionByName(clones)
    val viaText = Dedup.minHashPairs(Dedup.conversationText(turns),
        "conv_text", "conv_id", numHashes = 64, bands = 32, shingleK = 3,
        threshold = 0.7)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaSigs = Dedup.conversationMinHashPairs(turns,
        numHashes = 64, bands = 32, shingleK = 3, threshold = 0.7)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaText.nonEmpty, "fixture planted no pairs")
    assert(viaSigs == viaText,
      s"missing=${viaText -- viaSigs} extra=${viaSigs -- viaText}")
  }
}
