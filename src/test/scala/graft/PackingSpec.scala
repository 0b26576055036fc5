package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

/** Sequence packing: next-fit recurrence correctness (hand-computed
  * and against a local reference walk), shard isolation, and the
  * overflow/null edge cases the DuckDB recursive-CTE oracle shares.
  */
class PackingSpec extends AnyFunSuite {

  /** Local reference: the same next-fit recurrence as the oracle CTE. */
  private def refPack(docs: Seq[(Long, Long)], nShards: Int,
                      cap: Long): Map[Long, (Int, Long)] = {
    docs.groupBy { case (id, _) => (id % nShards).toInt }.flatMap {
      case (shard, ds) =>
        var cum = 0L; var seq = -1L
        ds.sortBy(_._1).map { case (id, n) =>
          if (seq < 0 || cum + n > cap) { seq += 1; cum = n }
          else cum += n
          id -> (shard, seq)
        }
    }
  }

  private def run(docs: Seq[(Long, Long)], nShards: Int, cap: Long) = {
    val spark = TestSpark.spark
    import spark.implicits._
    Packing.packNextFit(
        docs.toDF("doc_id", "n_tokens").repartition(7), // scrambled input
        "doc_id", "n_tokens", nShards, cap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("hand-computed next-fit: overflow starts a new sequence") {
    // one shard, capacity 10: [4,4] fill seq 0; 3 overflows -> seq 1;
    // [3,7] fills seq 1; 12 > cap gets its own seq 2; next doc seq 3
    val docs = Seq(0L -> 4L, 1L -> 4L, 2L -> 3L, 3L -> 7L, 4L -> 12L, 5L -> 1L)
    val out = run(docs, nShards = 1, cap = 10L)
    assert(out(0L) == ((0, 0L, 4L)) && out(1L) == ((0, 0L, 4L)))
    assert(out(2L) == ((0, 1L, 3L)) && out(3L) == ((0, 1L, 7L)))
    assert(out(4L) == ((0, 2L, 12L)), "over-capacity doc packs alone")
    assert(out(5L) == ((0, 3L, 1L)), "doc after an over-capacity doc starts fresh")
  }

  test("sequences never cross shards; assignment matches the reference walk") {
    val rnd = new scala.util.Random(42)
    val docs = (0L until 500L).map(id => id -> (1L + rnd.nextInt(90).toLong))
    val out = run(docs, nShards = 8, cap = 128L)
    val ref = refPack(docs, nShards = 8, cap = 128L)
    assert(out.size == docs.size)
    docs.foreach { case (id, n) =>
      val (shard, seq, tok) = out(id)
      assert(shard == (id % 8).toInt, s"doc $id shard")
      assert(tok == n, s"doc $id token count")
      assert((shard, seq) == ref(id), s"doc $id assignment")
    }
    // every sequence respects the capacity unless it is a single
    // over-capacity doc (none here: max doc is 90 <= 128)
    out.groupBy { case (_, (shard, seq, _)) => (shard, seq) }.foreach {
      case (key, members) =>
        assert(members.values.map(_._3).sum <= 128L, s"sequence $key overflows")
    }
  }

  test("negative ids shard by sign-preserving remainder, like the oracle") {
    val docs = Seq(-9L, -5L, -1L, 0L, 3L, 11L).map(id => id -> 4L)
    val out = run(docs, nShards = 4, cap = 10L)
    val ref = refPack(docs, nShards = 4, cap = 10L)
    docs.foreach { case (id, _) =>
      val (shard, seq, _) = out(id)
      assert(shard == (id % 4).toInt, s"doc $id shard (-9 % 4 == -1, not 3)")
      assert((shard, seq) == ref(id), s"doc $id assignment")
    }
  }

  test("a null doc id fails fast with a clear error") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(Some(0L), None).map(id => (id, 5L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Packing.packNextFit(df, "doc_id", "n_tokens", 1, 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("packNextFit: null doc_id")),
      s"expected the packNextFit null-id message, got: ${messages(e).mkString(" | ")}")
  }

  test("hash-sharded packing: string ids pass through, recurrence holds per shard") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val docs = (0 until 200).map(i => (f"doc$i%03d", 1L + i % 90))
    val out = Packing.packNextFitByHash(
        docs.toDF("doc_id", "n_tokens").repartition(5), // scrambled input
        "doc_id", "n_tokens", nShards = 8, capacity = 128L)
      .collect()
    assert(out.length == 200)
    assert(out.head.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType, "id keeps its original type")
    // shard is pmod(xxhash64(id), nShards), recomputed independently
    val expShard = docs.toDF("doc_id", "n")
      .select(col("doc_id"), pmod(xxhash64(col("doc_id")), lit(8L)).cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    out.foreach(r => assert(r.getInt(1) == expShard(r.getString(0)),
      s"${r.getString(0)} shard"))
    // walking each shard in (id, n) order reproduces every seq_id
    out.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      var cum = 0L; var seq = -1L
      rows.sortBy(r => (r.getString(0), r.getLong(3))).foreach { r =>
        val n = r.getLong(3)
        if (seq < 0 || cum + n > 128L) { seq += 1; cum = n } else cum += n
        assert(r.getLong(2) == seq, s"shard $shard doc ${r.getString(0)}")
      }
    }
    // determinism: a differently-partitioned second run is identical
    val out2 = Packing.packNextFitByHash(
        docs.toDF("doc_id", "n_tokens").repartition(3),
        "doc_id", "n_tokens", nShards = 8, capacity = 128L)
      .collect()
    assert(out.map(_.toSeq).toSet == out2.map(_.toSeq).toSet)
    // null ids fail fast with the hash variant's own message
    val bad = Seq((Option("a"), 5L), (Option.empty[String], 5L))
      .toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Packing.packNextFitByHash(bad, "doc_id", "n_tokens", 1, 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("packNextFitByHash: null doc_id")))
  }

  test("packing on BPE token counts: budget measured in model tokens (pk2 shape)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox", "lazy dog dog dog lazy",
      "quick quick brown brown fox fox", "over the lazy dog jumps the fox",
      "a b c d e f g h", "the the the the", "fox")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = graft.lm.Bpe.train(docs, "text", numMerges = 16)
    val counts = graft.lm.Bpe.tokenCounts(docs, "doc_id", "text", model)
    val out = Packing.packNextFit(counts, "doc_id", "n_tokens",
        nShards = 2, capacity = 12L)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // n_tokens in the packed output IS the model count, per doc
    val cache = scala.collection.mutable.HashMap.empty[String, Int]
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out(i.toLong)._3 == model.countTokens(t, cache),
        s"doc $i model-count parity")
    }
    // and the assignment matches the reference walk over those counts
    val ref = refPack(texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> model.countTokens(t, cache) }, nShards = 2, cap = 12L)
    out.foreach { case (id, (shard, seq, _)) =>
      assert((shard, seq) == ref(id), s"doc $id assignment")
    }
  }

  test("null token counts pack as zero-width") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((0L, Some(5L)), (1L, None), (2L, Some(5L)))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packNextFit(df, "doc_id", "n_tokens", 1, 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L),
      "5 + 0 + 5 fits one sequence of capacity 10")
  }
}
