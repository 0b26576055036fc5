package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.pipeline.CheckpointedRun

/** Scale soak: run the full checkpointed pipeline (bucketed commits,
  * metrics tables, skew split) over a corpus 1-2 orders of magnitude
  * beyond the bench, with a deliberately giant conversation, and print
  * one JSON line of evidence. Usage:
  *
  *   runMain graft.tools.Soak [nConvs] [skewCap] [skewMaxTurns] [buckets]
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val skewCap = args.lift(1).map(_.toInt).getOrElse(200000)
    val skewMaxTurns = args.lift(2).map(_.toInt).getOrElse(50000)
    val nBuckets = args.lift(3).map(_.toInt).getOrElse(8)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SOAK_MASTER", "local[32]"))
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val outRoot = corpus + "/out"
    val metricsRoot = corpus + "/metrics"

    val t0 = System.nanoTime()
    TranscriptGen.generate(spark, nConvs, seed = 42L, skewCap = skewCap,
      partitions = 256).write.parquet(s"$corpus/turns")
    val genSecs = (System.nanoTime() - t0) / 1e9

    val input = spark.read.schema(graft.schema.Turn.schema)
      .parquet(s"$corpus/turns").as[graft.schema.Turn]
    val t1 = System.nanoTime()
    val res = CheckpointedRun.run(input, outRoot, nBuckets,
      metricsRoot = Some(metricsRoot), skewMaxTurns = skewMaxTurns)
    val runSecs = (System.nanoTime() - t1) / 1e9

    val out = CheckpointedRun.readOutput(spark, outRoot, nBuckets)
    val row = out.agg(count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L))).head()
    val (n, kept) = (row.getLong(0), row.getLong(1))
    val maxConv = input.groupBy($"conv_id").count().agg(max("count")).head().getLong(0)
    val lineage = spark.read.parquet(s"$metricsRoot/rule_lineage/data/bucket=0")
    println(
      f"""{"soak":{"turns":$n,"kept":$kept,"max_conv_turns":$maxConv,"buckets":${res.bucketsComputed.size},"gen_secs":$genSecs%.1f,"pipeline_secs":$runSecs%.1f,"turns_per_sec":${n / runSecs}%.0f,"lineage_rules":${lineage.count()}}}""")
    spark.stop()
  }
}
