package graft

import org.apache.spark.sql.Observation
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.metrics.Metrics
import graft.oracle.OracleFilter
import graft.pipeline.QualityFilter

/** Lineage + counters must agree with the golden oracle's tallies. */
class MetricsSpec extends AnyFunSuite {

  test("observation counters and lineage match oracle tallies") {
    val spark = TestSpark.spark
    import spark.implicits._
    val turns = TranscriptGen.generateLocal(100, seed = 21, skewCap = 300)
    val golden = OracleFilter.run(turns)

    val obs = Observation("m")
    val labeled = Metrics.observed(QualityFilter.label(spark.createDataset(turns)), obs)
    labeled.write.mode("overwrite").format("noop").save()
    val row = obs.get
    assert(row("n_turns") == turns.length.toLong)
    assert(row("n_kept") == golden.count(_.keep).toLong)
    assert(row("n_dropped") == golden.count(!_.keep).toLong)
    assert(row("n_scrubbed_spans") ==
      golden.map(_.scrub_counts.values.sum).sum.toLong)

    // per-rule lineage == oracle reason histogram
    val lineage = Metrics.ruleLineage(QualityFilter.label(spark.createDataset(turns)), 8)
      .groupBy("rule").sum("n_dropped").as[(String, Long)].collect().toMap
    val goldenHist = golden.flatMap(_.drop_reasons)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(lineage == goldenHist)

    // bucket stats roll up to the same totals
    val stats = Metrics.bucketStats(QualityFilter.label(spark.createDataset(turns)), 8)
    assert(stats.count() <= 8)
    val kept = stats.agg(org.apache.spark.sql.functions.sum("n_kept")).head.getLong(0)
    assert(kept == golden.count(_.keep).toLong)
    val score = Metrics.qualityScore(stats)
    assert(math.abs(score - 100.0 * golden.count(_.keep) / golden.size) < 1e-9)
  }
}
