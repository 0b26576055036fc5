package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DocPipeline

/** Composite document-cleaning pipeline behavior. */
class DocPipelineSpec extends AnyFunSuite {

  test("labels: dups, near-dups, language, quality, scrub") {
    val spark = TestSpark.spark
    import spark.implicits._
    val good = "please make sure the tests pass before you merge the change today"
    val docs = Seq(
      (0L, good),
      (1L, good), // exact dup of 0
      (2L, good.replace("today", "tomorrow")), // near dup
      (3L, "el tiempo hoy es muy agradable y vamos a dar un paseo corto por el parque"),
      (4L, "short one"),
      (5L, "@#$% @#$% @#$% junk &*()"),
      (6L, "reach me at alice@example.com for the complete report details thanks"))
      .toDF("doc_id", "text")

    val out = DocPipeline.label(docs, cfg = DocPipeline.DocConfig(nearDupThreshold = 0.7)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getSeq[String](2).toList,
          r.getAs[String]("lang"), r.getAs[String]("scrubbed_text"))).toMap

    assert(out(0L)._1, out(0L).toString)
    assert(out(1L)._2.contains("exact_dup"))
    assert(out(2L)._2.contains("near_dup"))
    assert(out(3L)._2 == List("lang") && out(3L)._3 == "es")
    assert(out(4L)._2.contains("too_short"))
    assert(out(5L)._2.contains("symbol_noise"))
    assert(out(6L)._1 && out(6L)._4.contains("<EMAIL>"))
  }
}
