package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.ops.Dedup
import graft.pipeline.QualityFilter

/** Conv-near-dup LSH banding probe: reproduces SCALE.md's candidate-
  * volume measurement on the soak corpus so banding changes stay
  * evidence-backed. For each requested `bands` value it reports, on the
  * SAME generated corpus:
  *
  *  - `candidates`: distinct LSH candidate pairs (the bucket stage's
  *    output — measured by running the pair pipeline with the verify
  *    threshold at -1 so every candidate survives) and its wall-clock;
  *  - `true_pairs`: verified pairs at the production threshold, with
  *    the pair pipeline's own wall-clock;
  *  - `drop_secs`: wall-clock of JUST the real opt-in stage
  *    (QualityFilter.convNearDupDropIds → count), the number the soak
  *    pays per run — timed alone, nothing else in the block.
  *
  * Timing honesty: all legs run AFTER an untimed warm-up of the same
  * plan shapes on a small corpus (first execution of this pipeline
  * pays 2-4× JIT — see the Dedup candidate-stage note), and the
  * default banding order puts the NEW production banding first so any
  * residual cold-state cost biases AGAINST it, never for it. Legs
  * still share one JVM and page cache; for publication-grade absolute
  * numbers fork per leg (the Bench pattern) — the probe's job is the
  * relative A/B.
  *
  * Usage: runMain graft.tools.CndProbe [nConvs] [bands,bands,...]
  * (defaults: 2000000 and "16,32" — the round-6 production default vs
  * the round-5 flood banding). Prints one JSON line.
  */
object CndProbe {

  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val bandings = args.lift(1).getOrElse("16,32").split(",").map(_.trim.toInt).toSeq

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SOAK_MASTER", "local[32]"))
      .appName("graft-cnd-probe")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = java.nio.file.Files.createTempDirectory("graft_cnd").toString
    TranscriptGen.generate(spark, nConvs, seed = 42L, skewCap = 200000,
      partitions = 256).write.parquet(s"$corpus/turns")
    val turns = spark.read.schema(graft.schema.Turn.schema).parquet(s"$corpus/turns")
    val nTurns = turns.count()

    // untimed warm-up: the full candidate + drop plan shapes at every
    // requested banding over a small corpus, so codegen/JIT is settled
    // before any timed leg
    val warm = TranscriptGen.generate(spark, 50000L, seed = 43L,
      skewCap = 2000, partitions = 64).toDF()
    bandings.foreach { b =>
      Dedup.conversationMinHashPairs(warm, numHashes = 64, bands = b,
        shingleK = 3, threshold = -1.0).count()
      QualityFilter.convNearDupDropIds(warm,
        QualityFilter.ConvNearDupConfig(bands = b)).count()
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val perBand = bandings.map { b =>
      // candidate volume: threshold -1 keeps every candidate the bucket
      // stage emits (the verify join still runs — candidates are what
      // the flood pays for, so counting them through the same plan is
      // the honest measurement)
      val (cand, candSecs) = timed(Dedup.conversationMinHashPairs(
        turns, numHashes = 64, bands = b, shingleK = 3,
        threshold = -1.0).count())
      val (nPairs, pairSecs) = timed(Dedup.conversationMinHashPairs(
        turns, numHashes = 64, bands = b, shingleK = 3,
        threshold = 0.7).count())
      val cfg = QualityFilter.ConvNearDupConfig(bands = b)
      // the opt-in stage the soak pays, timed ALONE
      val (nDrop, dropSecs) = timed(
        QualityFilter.convNearDupDropIds(turns, cfg).count())
      f"""{"bands":$b,"rows_per_band":${64 / b},"candidates":$cand,"cand_stage_secs":$candSecs%.1f,"true_pairs":$nPairs,"pair_stage_secs":$pairSecs%.1f,"dropped_convs":$nDrop,"drop_stage_secs":$dropSecs%.1f}"""
    }
    // one JSON line, the soak convention
    println(s"""{"cnd_probe":{"n_convs":$nConvs,"n_turns":$nTurns,"bandings":[${perBand.mkString(",")}]}}""")

    graft.io.SnapshotTable.deleteTree(new java.io.File(corpus))
    spark.stop()
  }
}
