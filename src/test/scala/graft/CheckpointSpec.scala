package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TranscriptGen
import graft.metrics.Metrics
import graft.pipeline.{CheckpointedRun, QualityFilter}
import graft.schema.LabeledTurn

/** Snapshot-checkpoint resume (north rule): a run that stops after some
  * buckets must resume where it left off, and the final snapshot must
  * equal a whole-corpus run exactly.
  */
class CheckpointSpec extends AnyFunSuite {

  test("bucketed run + resume == whole-corpus run") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt").toString
    val turns = TranscriptGen.generateLocal(80, seed = 5, skewCap = 200)
    val ds = spark.createDataset(turns)
    val nBuckets = 6

    // phase 1: pretend a crash after 2 buckets — pre-commit buckets 0,1
    val table = graft.io.SnapshotTable(root, nBuckets)
    val bucket = Metrics.bucketCol(nBuckets)
    Seq(0, 1).foreach { b =>
      table.commitBucket(QualityFilter.label(ds.where(bucket === b)), b)
    }
    assert(table.completedBuckets == Set(0, 1))
    assert(table.currentVersion == 2)

    // phase 2: resume — must compute exactly the remaining buckets
    val res = CheckpointedRun.run(ds, root, nBuckets)
    assert(res.bucketsSkipped == Seq(0, 1))
    assert(res.bucketsComputed == Seq(2, 3, 4, 5))

    // snapshot read == full-run output, per-turn exact
    val fromSnapshot = CheckpointedRun.readOutput(spark, root, nBuckets)
      .as[LabeledTurn].collect().sortBy(t => (t.conv_id, t.turn_idx))
      .map(t => t.copy(drop_reasons = t.drop_reasons.toList)).toSeq
    val full = QualityFilter.label(ds).as[LabeledTurn].collect()
      .sortBy(t => (t.conv_id, t.turn_idx))
      .map(t => t.copy(drop_reasons = t.drop_reasons.toList)).toSeq
    assert(fromSnapshot == full)

    // idempotence: a third run computes nothing
    val res2 = CheckpointedRun.run(ds, root, nBuckets)
    assert(res2.bucketsComputed.isEmpty)
    assert(res2.bucketsSkipped == (0 until nBuckets))
  }

  test("snapshot isolation: uncommitted bucket is invisible") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt2").toString
    val turns = TranscriptGen.generateLocal(20, seed = 9, skewCap = 100)
    val ds = spark.createDataset(turns)
    val table = graft.io.SnapshotTable(root, 4)
    val bucket = Metrics.bucketCol(4)

    // data written but NOT committed (crash between write and commit)
    QualityFilter.label(ds.where(bucket === 2))
      .write.mode("overwrite").parquet(s"$root/data/bucket=2")
    assert(table.completedBuckets.isEmpty)
    assert(table.read(spark).isEmpty)

    table.commitBuckets(Set(2))
    assert(table.read(spark).count() > 0)
  }
}
