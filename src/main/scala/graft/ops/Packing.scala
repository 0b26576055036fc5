package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("bins") — the step between a cleaned corpus and a
  * training loader, where documents are concatenated into
  * context-window-sized examples and the packing decides both token
  * efficiency (fill ratio) and shuffle cost.
  *
  * Algorithm: deterministic NEXT-FIT per shard. Documents are sharded
  * by `doc_id % nShards`, ordered by `doc_id` within the shard, and
  * greedily appended to the current sequence; a document that would
  * overflow `capacity` starts the next sequence (a document longer
  * than `capacity` occupies a sequence alone — the loader's
  * truncate-or-split decision stays downstream, the packer stays
  * total). Next-fit is the industry default for training-data packing:
  * single pass, deterministic, and under Zipf-ish length distributions
  * within a few percent of first-fit-decreasing fill while preserving
  * a stable document order.
  *
  * Scale design (the 100 TB lens):
  *  - token counts are computed map-side (codegen `regexp_extract_all`
  *    + `size`) BEFORE the shuffle; only `(doc_id, shard, n_tokens)` —
  *    20 bytes/doc, never text — rides the exchange;
  *  - one hash exchange on `shard` + an intra-partition sort, then a
  *    single streaming `mapPartitions` pass holding O(1) state per
  *    shard (running total + sequence counter) — no window function,
  *    no driver involvement, no second pass;
  *  - `nShards` is the parallelism knob: production sets it to a small
  *    multiple of total cores, so each task streams one shard's
  *    id/count pairs. Packing is embarrassingly parallel ACROSS shards
  *    by construction (sequences never cross a shard), which is
  *    exactly how multi-worker training loaders consume the corpus.
  *
  * Determinism: shard assignment, intra-shard order (by `doc_id`, then
  * `n_tokens` so duplicate ids still order totally), and the next-fit
  * recurrence are pure functions of `doc_id` and the token counts, so
  * the full assignment is reproducible run-to-run and re-derivable by
  * the DuckDB oracle (a recursive CTE walks the same recurrence).
  * Rows that tie on BOTH keys are interchangeable in the recurrence, so
  * the assignment is still unique as a multiset.
  */
object Packing {

  /** Per-document sequence assignment: `(doc_id, shard, seq_id,
    * n_tokens)`, where `seq_id` numbers sequences within the shard in
    * document order. `tokensCol` must be a non-negative bigint column
    * (nulls are treated as 0 — an empty document packs for free).
    * `idCol` must be non-null: a null id has no shard or order, so the
    * pack fails fast with a clear error rather than guessing. Shard
    * assignment is sign-preserving `doc_id % nShards` (ANSI/DuckDB
    * remainder, so negative ids land in negative-numbered shards) —
    * the same expression the oracle CTE walks.
    */
  def packNextFit(docs: DataFrame, idCol: String, tokensCol: String,
                  nShards: Int, capacity: Long): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = capacity // local val: the closure serializes it by value
    val id = when(col(idCol).isNull,
        raise_error(lit(s"packNextFit: null $idCol — document ids must be non-null")))
      .otherwise(col(idCol)).cast("long")
    docs
      .select(
        id.as("doc_id"),
        (id % lit(nShards.toLong)).cast("int").as("shard"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .repartition(col("shard"))
      // n_tokens as the tie-break: duplicate doc_id values would
      // otherwise sort arbitrarily and make the cum/seq assignment
      // run-dependent (the oracle CTE orders by the same two keys)
      .sortWithinPartitions(col("shard"), col("doc_id"), col("n_tokens"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        // a hash partition may hold several whole shards (contiguous
        // after the sort); sequences never span shards, so the state
        // resets on every shard change
        var curShard = Int.MinValue
        var cum = 0L
        var seq = 0L
        it.map { case (id, shard, n) =>
          if (shard != curShard) { curShard = shard; seq = 0L; cum = n }
          else if (cum + n <= cap) { cum += n }
          else { seq += 1L; cum = n }
          (id, shard, seq, n)
        }
      }
      .toDF("doc_id", "shard", "seq_id", "n_tokens")
  }

  /** [[packNextFit]] for ids of ANY orderable type: shards by
    * `pmod(xxhash64(id), nShards)` and passes the id through with its
    * original type — never cast (the house convention since the
    * decontamination id handling; an ANSI cast of string ids throws).
    * Intra-shard order is (id, n_tokens) under the id type's native
    * ordering, so the assignment stays a pure, run-independent function
    * of the input. Same scale shape as [[packNextFit]]: token counts
    * map-side, one hash exchange of (id, shard, n_tokens), one
    * streaming O(1)-state pass. Long-keyed corpora whose oracle pins
    * the sign-preserving `id % nShards` shard keep using
    * [[packNextFit]]; hash sharding is the default for everything else.
    */
  def packNextFitByHash(docs: DataFrame, idCol: String, tokensCol: String,
                        nShards: Int, capacity: Long): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val cap = capacity
    val idField = docs.schema(docs.schema.fieldIndex(idCol))
    val id = when(col(idCol).isNull,
        raise_error(lit(s"packNextFitByHash: null $idCol — document ids must be non-null")))
      .otherwise(col(idCol))
    val outSchema = StructType(Seq(
      idField.copy(name = "doc_id"),
      StructField("shard", IntegerType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))
    docs
      .select(
        id.as("doc_id"),
        pmod(xxhash64(col(idCol)), lit(nShards.toLong)).cast("int").as("shard"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"), col("n_tokens"))
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var cum = 0L
        var seq = 0L
        it.map { r =>
          val shard = r.getInt(1)
          val n = r.getLong(2)
          if (shard != curShard) { curShard = shard; seq = 0L; cum = n }
          else if (cum + n <= cap) { cum += n }
          else { seq += 1L; cum = n }
          Row(r.get(0), shard, seq, n)
        }
      }(Encoders.row(outSchema))
  }
}
