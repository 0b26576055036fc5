package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Turn
import graft.scrub.Scrub
import graft.streaming.StreamingFilter

/** Streaming front-end: stateless labels + scrub must match the batch
  * semantics for the stateless subset; windowed metrics aggregate.
  */
class StreamingSpec extends AnyFunSuite {

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  test("memory stream: stateless labels + scrubbed text") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Turn]
    val labeled = StreamingFilter.label(input.toDS())
    val q = labeled.writeStream.format("memory")
      .queryName("graft_stream_out").outputMode("append").start()

    input.addData(
      Turn("c-1", 0, "user", "please check the data before the final decision, mail me at alice@example.com", null, ts(0)),
      Turn("c-1", 1, "assistant", "-", null, ts(1)),
      Turn("c-1", 2, "operator", "the meeting moved to thursday afternoon indeed", null, ts(2)),
      Turn("c-1", 3, "user", "@#$%^&*@#$%^&* junk te@xt", null, ts(3)),
      Turn("c-2", 0, "user", "xqzwjv kfpqx mzzkrw qqvtxp zzfkwj pqxmzr wvkqjx", null, ts(4)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("graft_stream_out")
      .select("conv_id", "turn_idx", "keep", "drop_reasons", "scrubbed_text")
      .as[(String, Int, Boolean, Seq[String], String)]
      .collect().sortBy(r => (r._1, r._2))

    assert(out.length == 5)
    assert(out(0)._3 && out(0)._4.isEmpty)
    assert(out(0)._5 == Scrub.scrubPlain(Scrub.normalizeWsPlain(
      "please check the data before the final decision, mail me at alice@example.com"))._1)
    assert(out(0)._5.endsWith("<EMAIL>"))
    assert(out(1)._4 == Seq("empty_text"))
    assert(out(2)._4 == Seq("bad_role"))
    assert(out(3)._4.contains("symbol_density"))
    assert(out(4)._4.contains("perplexity"))
  }

  test("stateful labels (flatMapGroupsWithState) == batch labels across micro-batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // conversation rules exercised: duplicate text (c-1), turn-index gap
    // (c-2), timestamp regression (c-3), first-turn offset (c-4);
    // single-language conversations so the prefix vote equals the batch
    // whole-conversation vote
    val turns = Seq(
      Turn("c-1", 0, "user", "the quarterly report is ready for your review today", null, ts(0)),
      Turn("c-1", 1, "assistant", "thanks for the update on the quarterly report", null, ts(1)),
      Turn("c-1", 2, "user", "the quarterly report is ready for your review today", null, ts(2)), // dup of turn 0
      Turn("c-2", 0, "user", "could you summarize the meeting notes from tuesday", null, ts(0)),
      Turn("c-2", 2, "assistant", "here is the summary of the meeting notes", null, ts(1)), // gap
      Turn("c-3", 0, "user", "let us schedule the next planning session soon", null, ts(5)),
      Turn("c-3", 1, "assistant", "the planning session works for me on friday", null, ts(3)), // ts regress
      Turn("c-4", 5, "user", "this conversation starts at index five somehow", null, ts(0))) // first != 0

    val input = MemoryStream[Turn]
    val labeled = StreamingFilter.statefulLabel(input.toDS())
    val q = labeled.writeStream.format("memory")
      .queryName("graft_stream_stateful").outputMode("append").start()
    // split MID-conversation: state must carry across micro-batches
    input.addData(turns.take(4): _*)
    q.processAllAvailable()
    input.addData(turns.drop(4): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("graft_stream_stateful")
      .select("conv_id", "turn_idx", "keep", "drop_reasons", "scrubbed_text")
      .as[(String, Int, Boolean, Seq[String], String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = graft.pipeline.QualityFilter.label(spark.createDataset(turns))
      .select("conv_id", "turn_idx", "keep", "drop_reasons", "scrubbed_text")
      .as[(String, Int, Boolean, Seq[String], String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(r => r.copy(_4 = r._4.toList)) == batch.map(r => r.copy(_4 = r._4.toList)),
      s"stateful stream diverged:\n got=$got\n exp=$batch")
    // the interesting rules actually fired
    val reasons = got.flatMap(_._4).toSet
    assert(reasons.contains("duplicate_turn") || reasons.exists(_.contains("dup")),
      s"reasons: $reasons")
    assert(got.count(!_._3) >= 3, s"expected several drops: $got")
  }

  test("windowed metrics stream with watermark") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Turn]
    val metrics = StreamingFilter.metrics(StreamingFilter.label(input.toDS()))
    val q = metrics.writeStream.format("memory")
      .queryName("graft_stream_metrics").outputMode("complete").start()

    input.addData((0 until 20).map(i =>
      Turn("c-9", i, "user",
        if (i % 4 == 0) "-" else s"a perfectly reasonable message number $i about the weather",
        null, ts(i))): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("graft_stream_metrics").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_turns")).sum
    assert(total == 20)
  }
}
