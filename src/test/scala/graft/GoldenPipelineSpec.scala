package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.oracle.OracleFilter
import graft.pipeline.QualityFilter
import graft.schema.LabeledTurn

/** The correctness gate of the north rule: the distributed pipeline must
  * match the sequential golden oracle per turn EXACTLY (keep/drop label,
  * drop_reasons, scrubbed text, lang, ppl, scrub_counts) under stable
  * (conv_id, turn_idx) ordering. F1 target is ≥0.99; exact equality is
  * stronger and is what we assert.
  */
class GoldenPipelineSpec extends AnyFunSuite {

  private def normalize(t: LabeledTurn): LabeledTurn =
    t.copy(drop_reasons = t.drop_reasons.toList,
      scrub_counts = t.scrub_counts.toSeq.sortBy(_._1).toMap)

  private def compare(nConvs: Int, seed: Long, skewCap: Int = 500): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val turns = TranscriptGen.generateLocal(nConvs, seed, skewCap)
    val expected = OracleFilter.run(turns).map(normalize)

    val ds = spark.createDataset(turns).repartition(7) // scramble layout
    val actual = QualityFilter.label(ds).as[LabeledTurn]
      .collect().sortBy(t => (t.conv_id, t.turn_idx)).map(normalize)

    assert(actual.length == expected.length, "row count mismatch")
    var mismatches = 0
    expected.zip(actual).foreach { case (e, a) =>
      if (e != a && mismatches < 5) {
        mismatches += 1
        info(s"MISMATCH at (${e.conv_id},${e.turn_idx}):\n  oracle = $e\n  spark  = $a")
      }
    }
    assert(expected.zip(actual).count { case (e, a) => e != a } == 0,
      s"per-turn mismatches out of ${expected.length} turns")
  }

  test("tiny corpus: pipeline == oracle exactly (seed 7)") {
    compare(nConvs = 60, seed = 7)
  }

  test("different seed + more convs: pipeline == oracle exactly (seed 42)") {
    compare(nConvs = 200, seed = 42)
  }

  test("labels are stable under different parallelism") {
    val spark = TestSpark.spark
    import spark.implicits._
    val turns = TranscriptGen.generateLocal(80, 13, skewCap = 300)
    val a = QualityFilter.label(spark.createDataset(turns).repartition(2))
      .as[LabeledTurn].collect().sortBy(t => (t.conv_id, t.turn_idx)).map(normalize)
    val b = QualityFilter.label(spark.createDataset(turns).repartition(23))
      .as[LabeledTurn].collect().sortBy(t => (t.conv_id, t.turn_idx)).map(normalize)
    assert(a.toSeq == b.toSeq)
  }

  test("medium corpus: exact parity + keep/drop F1 reported (target ≥ 0.99)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val turns = TranscriptGen.generateLocal(4000, seed = 2026, skewCap = 1500)
    info(s"corpus: ${turns.size} turns, ${turns.map(_.conv_id).distinct.size} convs")
    val expected = OracleFilter.run(turns).map(normalize)
    val actual = QualityFilter.label(spark.createDataset(turns).repartition(16))
      .as[LabeledTurn].collect().sortBy(t => (t.conv_id, t.turn_idx)).map(normalize)

    // keep/drop F1 vs the reference-semantics oracle (the BASELINE
    // metric; exact parity implies F1 = 1.0)
    val tp = expected.zip(actual).count { case (e, a) => !e.keep && !a.keep }
    val fp = expected.zip(actual).count { case (e, a) => e.keep && !a.keep }
    val fn = expected.zip(actual).count { case (e, a) => !e.keep && a.keep }
    val f1 = 2.0 * tp / (2.0 * tp + fp + fn)
    info(f"keep/drop F1 = $f1%.6f (drops: ${expected.count(!_.keep)} of ${expected.size})")
    assert(f1 >= 0.99)
    // and the stronger gate: full per-turn equality incl. scrubbed text
    assert(expected.zip(actual).count { case (e, a) => e != a } == 0)
  }

  test("distributed generator == local generator") {
    val spark = TestSpark.spark
    val viaSpark = TranscriptGen.generate(spark, 50, seed = 99, skewCap = 200, partitions = 6)
      .collect().sortBy(t => (t.conv_id, t.turn_idx)).toSeq
    val local = TranscriptGen.generateLocal(50, 99, skewCap = 200)
      .sortBy(t => (t.conv_id, t.turn_idx))
    assert(viaSpark == local)
  }
}
