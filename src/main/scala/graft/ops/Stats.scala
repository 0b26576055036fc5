package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics / percentiles.
  *
  * Spark's built-in `percentile` is exact but single-buffer: every
  * value is shuffled into ONE aggregation state and sorted there —
  * at 10^12 rows that task is the job. This implementation keeps the
  * exactness (required: the driver's oracle is DuckDB `quantile_cont`,
  * linear interpolation on true order statistics) with only scalable
  * primitives:
  *
  *  1. count/min/max — one partial-agg pass;
  *  2. 65 536-bucket histogram over the value range — one partial-agg
  *     pass (65k rows to the driver);
  *  3. cumulative bucket counts locate the buckets containing the
  *     needed order statistics; ONE filter-collect fetches just those
  *     buckets' values (≈ n/65536 each). A pathological bucket bigger
  *     than `maxCollect` recurses into step 2 on the narrowed range —
  *     the range shrinks 65 536× per level, so depth is bounded by the
  *     float's distinct-value structure (identical values short-circuit
  *     via min==max).
  *
  * Interpolation uses DuckDB's quantile_cont form
  * `(crn-rn)·x_floor + (rn-frn)·x_ceil` so oracle comparisons are
  * bit-faithful.
  */
object Stats {

  /** Exact percentiles of a numeric column (nulls ignored), linear
    * interpolation on true order statistics. Values must be finite
    * (NaN/Inf would poison the histogram range — same contract as
    * DuckDB quantile_cont's ordering).
    */
  def exactPercentiles(df: DataFrame, column: String, ps: Seq[Double],
                       maxCollect: Int = 1 << 20): Seq[Double] = {
    val vals = df.select(col(column).cast("double").as("v"))
      .where(col("v").isNotNull)
    val head = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = head.getLong(0)
    if (n == 0) return ps.map(_ => Double.NaN)
    val mn = head.getDouble(1)
    val mx = head.getDouble(2)
    val targets: Seq[Long] = ps.flatMap { p =>
      val rn = p * (n - 1)
      Seq(math.floor(rn).toLong, math.ceil(rn).toLong)
    }.distinct.sorted
    val stats = orderStats(vals, targets.map(k => (k, k)), mn, mx, n, maxCollect)
    ps.map { p =>
      val rn = p * (n - 1)
      val frn = math.floor(rn)
      val crn = math.ceil(rn)
      if (crn == frn) stats(frn.toLong)
      else (crn - rn) * stats(frn.toLong) + (rn - frn) * stats(crn.toLong)
    }
  }

  /** ks: (globalKey, localIndexWithinThisRange); returns globalKey →
    * value. `total` is the row count of `vals` (all within [mn, mx]).
    */
  private def orderStats(vals: DataFrame, ks: Seq[(Long, Long)],
                         mn: Double, mx: Double, total: Long,
                         maxCollect: Int): Map[Long, Double] = {
    if (mn == mx) return ks.map { case (g, _) => g -> mn }.toMap
    if (total <= maxCollect) {
      val arr = vals.collect().map(_.getDouble(0))
      java.util.Arrays.sort(arr)
      return ks.map { case (g, l) => g -> arr(l.toInt) }.toMap
    }
    val nb = 65536
    val span = mx - mn
    val bucket = least(greatest(
      floor((col("v") - mn) / span * nb), lit(0.0)), lit((nb - 1).toDouble))
      .cast("int")
    val hist = vals.groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val located = hist.map { case (b, c) => val s = acc; acc += c; (b, s, c) }
    // bucket containing each local index
    val byBucket = ks.groupBy { case (_, l) =>
      located.find(t => l >= t._2 && l < t._2 + t._3)
        .getOrElse(throw new IllegalStateException(s"index $l outside histogram"))
    }
    val (small, big) = byBucket.partition { case ((_, _, c), _) => c <= maxCollect }
    val fromSmall: Map[Long, Double] =
      if (small.isEmpty) Map.empty
      else {
        val wanted = small.keys.map(_._1).toSeq
        val rows = vals.select(bucket.as("b"), col("v"))
          .where(col("b").isin(wanted: _*))
          .collect().map(r => (r.getInt(0), r.getDouble(1)))
        val grouped = rows.groupBy(_._1).map { case (b, vs) =>
          val arr = vs.map(_._2)
          java.util.Arrays.sort(arr)
          b -> arr
        }
        small.flatMap { case ((b, s, _), bks) =>
          bks.map { case (g, l) => g -> grouped(b)((l - s).toInt) }
        }.toMap
      }
    val fromBig: Map[Long, Double] = big.flatMap { case ((b, s, c), bks) =>
      val sub = vals.where(bucket === b)
      val subHead = sub.agg(min(col("v")), max(col("v"))).head()
      orderStats(sub, bks.map { case (g, l) => (g, l - s) },
        subHead.getDouble(0), subHead.getDouble(1), c, maxCollect)
    }.toMap
    fromSmall ++ fromBig
  }
}
