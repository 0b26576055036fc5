package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.pipeline.QualityFilter
import graft.oracle.OracleFilter
import graft.schema.LabeledTurn

/** The skew-split path (range-bucketed windows for giant conversations)
  * must produce EXACTLY the labels of the standard path and the golden
  * oracle — on corpora where several conversations exceed the bucket
  * threshold, with turn-index gaps spanning whole buckets.
  */
class SkewSpec extends AnyFunSuite {

  private def normalize(t: LabeledTurn): LabeledTurn =
    t.copy(drop_reasons = t.drop_reasons.toList,
      scrub_counts = t.scrub_counts.toSeq.sortBy(_._1).toMap)

  test("skew-split == standard path == oracle on a skewed corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    // skewCap 800 with threshold 25 → many conversations take the
    // giant path, most take the normal path
    val turns = TranscriptGen.generateLocal(250, seed = 33, skewCap = 800)
    val ds = spark.createDataset(turns).repartition(9)

    val expected = OracleFilter.run(turns).map(normalize)
    val standard = QualityFilter.label(ds).as[LabeledTurn]
      .collect().sortBy(t => (t.conv_id, t.turn_idx)).map(normalize)
    val split = QualityFilter.label(ds, skewMaxTurns = 25).as[LabeledTurn]
      .collect().sortBy(t => (t.conv_id, t.turn_idx)).map(normalize)

    assert(standard.toSeq == expected)
    assert(split.toSeq == expected, {
      val bad = expected.zip(split).filter { case (e, a) => e != a }.take(3)
      s"${bad.size}+ mismatches, first: ${bad.headOption}"
    })
    // sanity: the giant path actually ran
    val maxConv = turns.groupBy(_.conv_id).map(_._2.size).max
    assert(maxConv > 25, s"fixture too small (max conv $maxConv)")
  }
}
