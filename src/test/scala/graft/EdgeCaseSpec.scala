package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.oracle.OracleFilter
import graft.pipeline.QualityFilter
import graft.schema.{LabeledTurn, Turn}

/** Degenerate inputs: empty corpus, single-turn conversations,
  * all-null text, null tool/role combinations.
  */
class EdgeCaseSpec extends AnyFunSuite {

  test("empty input → empty output") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = QualityFilter.label(spark.emptyDataset[Turn])
    assert(out.count() == 0)
    assert(OracleFilter.run(Nil).isEmpty)
  }

  test("single-turn conversations and all-null text parity") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ts0 = new Timestamp(1700000000000L)
    val turns = Seq(
      Turn("a", 0, "user", null, null, ts0),
      Turn("b", 0, "system", "fine single turn conversation here", null, ts0),
      Turn("c", 5, "assistant", null, null, null), // null ts too
      Turn("d", 0, null, "role is null here today", "search", ts0))
    val expected = OracleFilter.run(turns)
    val actual = QualityFilter.label(spark.createDataset(turns))
      .as[LabeledTurn].collect().sortBy(t => (t.conv_id, t.turn_idx))
      .map(t => t.copy(drop_reasons = t.drop_reasons.toList))
    assert(actual.toSeq == expected.map(t => t.copy(drop_reasons = t.drop_reasons.toList)))
    val byConv = actual.map(t => t.conv_id -> t.drop_reasons).toMap
    assert(byConv("a").contains("empty_text"))
    assert(byConv("b").isEmpty)
    assert(byConv("c") == List("empty_text", "non_contiguous_turn"))
    assert(byConv("d").contains("bad_role"))
    assert(byConv("d").contains("bad_tool")) // null role can't bear a tool
  }

  test("snapshot history + expiry") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_exp").toString
    val t = graft.io.SnapshotTable(root, 8)
    (0 until 5).foreach(b => t.commitBucket(Seq((b, "x")).toDF("k", "v"), b))
    assert(t.snapshotHistory == Seq(1, 2, 3, 4, 5))
    val dropped = t.expireSnapshots(keepLast = 2)
    assert(dropped == Seq(1, 2, 3))
    assert(t.snapshotHistory == Seq(4, 5))
    assert(t.currentVersion == 5)
    assert(t.read(spark).count() == 5) // data untouched
    assert(t.readAt(spark, 1).isEmpty)  // expired manifest unreadable
  }

  test("expiry after rollback never drops the current or newest-k snapshots") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_exp2").toString
    val t = graft.io.SnapshotTable(root, 8)
    (0 until 5).foreach(b => t.commitBucket(Seq((b, "x")).toDF("k", "v"), b))
    t.rollbackTo(3)
    val dropped = t.expireSnapshots(keepLast = 2)
    assert(dropped == Seq(1, 2), s"dropped $dropped")
    assert(t.snapshotHistory == Seq(3, 4, 5)) // current 3 kept + newest 2
    assert(t.currentVersion == 3)
    assert(t.read(spark).count() == 3)
  }
}
