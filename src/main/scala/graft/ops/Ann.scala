package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAlgos.mix64

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; broadcast the query set,
  * no shuffle of the corpus). Scale path: signed-random-projection LSH
  * (deterministic seeded hyperplanes) — candidates share a signature
  * bucket, so the corpus scan is an equi-join on a 64-bit key instead
  * of a cross join; recall is tunable via number of tables/bits.
  */
object Ann {

  /** Cosine similarity of two float-array columns in double precision.
    *
    * r7: a single whole-stage-codegen expression
    * ([[graft.functions.GraftExpressions.cosineSim]]). The previous
    * zip_with/aggregate chain ran as CodegenFallback — interpreted
    * lambda evaluation plus an intermediate array per transform, per
    * row. Null semantics and accumulation order are replicated exactly
    * (SimilaritySpec's differential pins it to the old chain).
    */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.cosine_sim(a, b)

  /** Exact top-k: crossJoin(broadcast(queries)) → cosine → per-query
    * top-k window. At 100 TB corpus scale this is one full scan per
    * batch of queries — the right baseline, embarrassingly parallel,
    * zero shuffle except the final per-query top-k (tiny).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     roundTo: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(q))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qvec"), col("nvec")), roundTo).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** LSH-bucketed ANN: queries and corpus are hashed into `tables`
    * signature buckets; candidates = bucket collisions in ANY table;
    * exact cosine re-rank of candidates only.
    *
    * Shuffle shape: ONLY (tbl, bucket, id) rides the bucket join —
    * round 1 carried the full embedding through posexplode, amplifying
    * the fattest column ×tables through the exchange. Vectors are
    * joined back after candidate-pair dedup (query side broadcast —
    * the query batch is small by construction).
    *
    * Hot buckets are capped on the CORPUS side at `maxBucket` ids (the
    * same cap/observe pattern as [[Dedup.lshBucketPairs]]): a
    * degenerate bucket (zero-ish vectors hashing alike) would otherwise
    * inflate the candidate set for every query landing in it. The kept
    * ids are the sorted-prefix sample; truncation is surfaced via the
    * observed `ann2_capped_buckets`/`ann2_dropped_ids` metrics and
    * costs recall only inside degenerate buckets (other tables still
    * route the query to its true neighbors).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              tables: Int = 8, bits: Int = 12, seed: Long = 42L,
              roundTo: Int = 4, maxBucket: Int = 4096): DataFrame = {
    import graft.functions.GraftExpressions.srp_sig
    // posexplode input deliberately NOT a bare attribute: Spark's
    // InferFiltersFromGenerate infers size(attr)>0/isnotnull(attr) which
    // predicate-pushdown then inlines through the sig-defining Project —
    // re-evaluating the signature expression 3x per row in the scan
    // filter. slice(sig, 1, tables) is the identity on a length-`tables`
    // array and blocks the inference (non-attribute generator input).
    def keys(df: DataFrame, outId: String) = df
      .where(col(vecCol).isNotNull)
      .select(col(idCol).as(outId), srp_sig(col(vecCol), seed, tables, bits).as("sig"))
      .select(col(outId), posexplode(slice(col("sig"), 1, tables)))
      .select(col(outId), col("pos").as("tbl"), col("col").as("bucket"))

    val corpusKeys = keys(corpus, "nid")
      .groupBy(col("tbl"), col("bucket"))
      .agg(sort_array(collect_list(col("nid"))).as("ids"))
      .observe("ann2_buckets",
        sum(when(size(col("ids")) > maxBucket, 1).otherwise(0)).as("ann2_capped_buckets"),
        sum(when(size(col("ids")) > maxBucket, size(col("ids")) - maxBucket)
          .otherwise(0)).as("ann2_dropped_ids"))
      .select(col("tbl"), col("bucket"),
        explode(when(size(col("ids")) > maxBucket, slice(col("ids"), 1, maxBucket))
          .otherwise(col("ids"))).as("nid"))

    val cand = keys(queries, "qid").join(corpusKeys, Seq("tbl", "bucket"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")

    val scored = cand
      .join(broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))), Seq("qid"))
      .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), Seq("nid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qvec"), col("nvec")), roundTo).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** Squared L2 distance to every centroid; returns cell indices sorted
    * by (distance, index) — deterministic tie-break, shared by train /
    * assign / probe so all three agree bit-for-bit.
    */
  private def cellsByDistance(cs: Array[Array[Double]], v: Array[Float]): Array[Int] = {
    val ds = new Array[(Double, Int)](cs.length)
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val diff = v(i) - cs(c)(i); d += diff * diff; i += 1
      }
      ds(c) = (d, c)
      c += 1
    }
    ds.sorted.map(_._2)
  }

  private def nearestCell(cs: Array[Array[Double]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val diff = v(i) - cs(c)(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer trained with a
    * FIXED number of Lloyd iterations from deterministic seeded
    * centroids, corpus assigned to nearest centroid (map-side,
    * broadcast centroids), queries probe the `nprobe` nearest cells,
    * exact cosine re-rank inside the probed cells only.
    *
    * Training runs on a deterministic SAMPLE, not the corpus: the
    * `trainSample` rows with smallest splitmix hash (same selection as
    * the centroid init, TakeOrdered — no full sort) are cached and the
    * `iters` Lloyd aggregations iterate over them. A coarse quantizer
    * only needs a representative sample (standard FAISS practice); the
    * full corpus is scanned ONCE for the final assignment — round 3
    * paid `iters` extra full-corpus scans here.
    *
    * Scale shape: training = `iters` aggregations of (cell, sum-vec,
    * count) over the cached sample — partial-agg'd; search shuffles
    * only (cell, id) pairs. Assignment/probe run as typed mapPartitions
    * over primitive float arrays (the round-2 per-row `udf` boxed a
    * Seq[Float] per call).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nCells: Int = 16, nProbe: Int = 4, iters: Int = 5,
              seed: Long = 42L, roundTo: Int = 4,
              trainSample: Int = 1 << 17): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val vecs = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]

    // deterministic splitmix sample: the trainSample rows with smallest
    // mix64(id ^ seed) — a TakeOrdered (per-partition top-K + merge),
    // never a full sort; ≤ trainSample × dim floats, cached for the
    // Lloyd loop. On a corpus smaller than trainSample this is the
    // whole corpus and training matches the round-3 behavior exactly.
    val nTrain = math.max(trainSample, nCells)
    val sample = vecs
      .map { case (id, v) => (mix64(id ^ seed), v) }
      .toDF("h", "v").orderBy(col("h")).limit(nTrain)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic init: the nCells smallest-hash sample rows
    var centroids: Array[Array[Double]] = sample
      .orderBy(col("h")).limit(nCells)
      .select(col("v")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))

    // Lloyd iterations as aggregations over the sample: per-(cell, dim)
    // FIXED-POINT sums (integer addition is order-independent →
    // bit-deterministic under any partitioning) accumulated as
    // decimal(38,0) — long sums would overflow at ~5×10^8 rows/cell
    // with 2^24 scaling; decimal partial aggregation keeps exactness to
    // ~10^21 rows/cell. Map-side combine applies; only nCells × dim
    // tiny rows reach the driver.
    val Fixed = 1L << 24
    val sampleVecs = sample.select(col("v")).as[Array[Float]]
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(centroids)
      val sums = sampleVecs
        .mapPartitions { it =>
          val cs = bc.value
          it.flatMap { v =>
            val cell = nearestCell(cs, v)
            Iterator.tabulate(v.length)(pos =>
              (cell, pos, (v(pos).toDouble * Fixed).toLong))
          }
        }
        .toDF("cell", "pos", "fx")
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("fx").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cell = r.getInt(0); val pos = r.getInt(1)
        next(cell)(pos) =
          r.getDecimal(2).toBigInteger.doubleValue() / Fixed / r.getLong(3)
      }
      centroids = next
    }
    sample.unpersist(blocking = false)

    val bc = spark.sparkContext.broadcast(centroids)
    val cells = corpus.select(col(idCol).cast("long").as("nid"), col(vecCol).as("nvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, v, nearestCell(cs, v)) }
      }
      .toDF("nid", "nvec", "cell")
    val probes = queries.select(col(idCol).cast("long").as("qid"), col(vecCol).as("qvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          cellsByDistance(cs, v).take(nProbe).iterator.map(c => (id, v, c))
        }
      }
      .toDF("qid", "qvec", "cell")

    val scored = probes.join(cells, Seq("cell"))
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qvec"), col("nvec")), roundTo).as("sim"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"))
  }

  /** Embedding near-duplicate pairs: SRP bucketing with the same
    * groupBy(bucket) → capped in-bucket pair expansion as
    * [[Dedup.minHashPairs]] (signature computed once per row, only
    * (tbl, bucket, id) shuffled, hot buckets truncated with observed
    * metrics); embeddings joined back after pair dedup for the exact
    * cosine verify.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         tables: Int = 8, bits: Int = 12, seed: Long = 42L,
                         maxBucket: Int = 256): DataFrame = {
    import graft.functions.GraftExpressions.srp_sig
    // slice = identity guard against InferFiltersFromGenerate (see lshTopK)
    val keys = df
      .where(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), srp_sig(col(vecCol), seed, tables, bits).as("sig"))
      .select(col("id"), posexplode(slice(col("sig"), 1, tables)))
      .select(col("id"), col("pos").as("tbl"), col("col").as("bucket"))
    val cand = Dedup.lshBucketPairs(keys, Seq("tbl", "bucket"), col("id"),
        maxBucket, "ann3")
      .distinct()
    cand
      .join(df.select(col(idCol).as("id_a"), col(vecCol).as("va")), Seq("id_a"))
      .join(df.select(col(idCol).as("id_b"), col(vecCol).as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineCol(col("va"), col("vb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
