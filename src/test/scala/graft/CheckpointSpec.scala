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

  test("crash between data and metrics commits re-runs the bucket (metrics never lost)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt3").toString
    val mroot = Files.createTempDirectory("graft_ckpt3_m").toString
    val turns = TranscriptGen.generateLocal(40, seed = 11, skewCap = 100)
    val ds = spark.createDataset(turns)
    val nBuckets = 4

    // simulate the crash: bucket 0 committed to the DATA table only —
    // the metrics tables never saw it
    val table = graft.io.SnapshotTable(root, nBuckets)
    val bucket = Metrics.bucketCol(nBuckets)
    table.commitBucket(QualityFilter.label(ds.where(bucket === 0)), 0)
    assert(table.completedBuckets == Set(0))

    // resume with metrics enabled: bucket 0 must be RE-RUN (recommit is
    // idempotent), so the metrics tables are backfilled
    val res = CheckpointedRun.run(ds, root, nBuckets, metricsRoot = Some(mroot))
    assert(res.bucketsComputed == (0 until nBuckets),
      s"bucket 0 must not be skipped: $res")
    val stats = graft.io.SnapshotTable(s"$mroot/bucket_stats", nBuckets)
    val lineage = graft.io.SnapshotTable(s"$mroot/rule_lineage", nBuckets)
    assert(stats.completedBuckets == (0 until nBuckets).toSet)
    assert(lineage.completedBuckets == (0 until nBuckets).toSet)
    // and the metrics frame covers every bucket's rows
    val statRows = stats.read(spark).count()
    assert(statRows > 0)

    // a further resume skips everything (data ∩ metrics complete)
    val res2 = CheckpointedRun.run(ds, root, nBuckets, metricsRoot = Some(mroot))
    assert(res2.bucketsComputed.isEmpty)
  }

  test("a second writer's commit never silently drops the first's buckets") {
    val root = Files.createTempDirectory("graft_ckpt4").toString
    val t1 = graft.io.SnapshotTable(root, 4)
    val t2 = graft.io.SnapshotTable(root, 4)
    val spark = TestSpark.spark
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v").write.mode("overwrite").parquet(s"$root/data/bucket=0")
    Seq((2, "b")).toDF("k", "v").write.mode("overwrite").parquet(s"$root/data/bucket=1")
    t1.commitBuckets(Set(0)) // v1
    // a divergent/stale manifest at the next version (e.g. left by a
    // killed writer): allocation must skip PAST it, never overwrite it
    val stale = java.nio.file.Paths.get(root, "_graft", "manifest-v2.json")
    java.nio.file.Files.write(stale, "{}".getBytes)
    val v = t2.commitBuckets(Set(1))
    assert(v == 3, s"allocated $v")
    assert(t2.completedBuckets == Set(0, 1)) // t1's commit survived
    assert(new String(java.nio.file.Files.readAllBytes(stale)) == "{}") // untouched
    // rollback then commit: the new snapshot supersedes without
    // overwriting the divergent future
    t2.rollbackTo(1)
    val v2 = t2.commitBuckets(Set(1))
    assert(v2 == 4 && t2.completedBuckets == Set(0, 1))
  }
}
