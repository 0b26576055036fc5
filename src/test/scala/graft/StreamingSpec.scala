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
