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
  *    threshold at -1 so every candidate survives);
  *  - `true_pairs`: verified pairs at the production threshold;
  *  - `drop_secs`: wall-clock of the real opt-in stage
  *    (QualityFilter.convNearDupDropIds → count), the number the soak
  *    pays per run.
  *
  * Usage: runMain graft.tools.CndProbe [nConvs] [bands,bands,...]
  * (defaults: 2000000 and "32,16" — the round-5 flood banding vs the
  * round-6 production default). Prints one JSON line.
  */
object CndProbe {

  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val bandings = args.lift(1).getOrElse("32,16").split(",").map(_.trim.toInt).toSeq

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
      val cfg = QualityFilter.ConvNearDupConfig(bands = b)
      val (info, dropSecs) = timed {
        val d = QualityFilter.convNearDupDropIds(turns, cfg)
        val pairs = Dedup.conversationMinHashPairs(turns,
          numHashes = 64, bands = b, shingleK = 3, threshold = cfg.threshold)
        (pairs.count(), d.count())
      }
      f"""{"bands":$b,"rows_per_band":${64 / b},"candidates":$cand,"cand_stage_secs":$candSecs%.1f,"true_pairs":${info._1},"dropped_convs":${info._2},"drop_stage_secs":$dropSecs%.1f}"""
    }
    // one JSON line, the soak convention
    println(s"""{"cnd_probe":{"n_convs":$nConvs,"n_turns":$nTurns,"bandings":[${perBand.mkString(",")}]}}""")

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(corpus))
    spark.stop()
  }
}
