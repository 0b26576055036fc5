package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.gen.TranscriptGen
import graft.pipeline.QualityFilter

/** Dumps `.explain("formatted")` for every headline query plus the
  * pipeline plans the r7 optimization round touched, one file per
  * query: `<outDir>/<name>_<tag>.txt`. Run against the r6 checkout
  * with tag `before` and the current tree with tag `after` to produce
  * the plans/r07 evidence pair. Usage:
  *
  *   runMain graft.tools.PlanDumpR07 <outDir> <tag> [sfDir]
  */
object PlanDumpR07 {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/root/repo/plans/r07")
    val tag = args.lift(1).getOrElse("after")
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.001")

    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-dump-r07")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"), p.getBytes(UTF_8))
      println(s"PLANDUMP $name -> $outDir/${name}_$tag.txt")
    }

    Seq("q1_pricing_agg", "q2_join_revenue", "a8_outlier_iqr",
      "w1_window_sessions", "dd2_minhash_pairs", "ann1_brute_topk",
      "dd1_dedup_exact", "ts1_token_quality").foreach { name =>
      dump(name, graft.SparkEntry.queries(name)(s, sf))
    }

    // flagship pipeline + the ANN paths whose operators changed.
    // The label plan is dumped over a PARQUET corpus (like the bench),
    // so scoring-stage object boundaries are visible without the
    // in-memory generator's own MapPartitions nodes.
    val corpus = "/tmp/graft_plandump_corpus.parquet"
    if (!new java.io.File(corpus).exists())
      TranscriptGen.generate(s, 50, 1L, 100).write.mode("overwrite").parquet(corpus)
    dump("qf1_flagship_label", QualityFilter.run(s, corpus))
    val e = s.read.parquet(s"$sf/embeddings.parquet")
    dump("ann2_lsh_topk", graft.ops.Ann.lshTopK(
      e, e.where(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 3, tables = 8, bits = 8))
    dump("cd2_conv_neardup",
      graft.ops.Dedup.conversationMinHashPairs(
        TranscriptGen.generate(s, 40, 1L, 200).toDF()))

    s.stop()
  }
}
