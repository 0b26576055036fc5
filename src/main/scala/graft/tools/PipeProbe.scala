package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.TranscriptGen
import graft.pipeline.QualityFilter
import graft.schema.Turn

/** Pipeline phase probe (optimization round measurement tool, guide
  * §1.1/§1.4): times each stage of the flagship pipeline in isolation
  * with the noop sink so the per-stage cost split (scan / score /
  * shuffle+windows / scrub projection) is visible. Bench.scala is
  * frozen; this is the separate measurement main the round rules call
  * for. Usage:
  *
  *   runMain graft.tools.PipeProbe [nConvs] [cores] [runs]
  *
  * defaults: 350000 convs, 4 cores, 3 runs per phase (min reported).
  * Corpus is cached at /tmp/graft_probe_<n>.parquet across invocations
  * (input data only — never results).
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = args.lift(0).map(_.toLong).getOrElse(350000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(4)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)

    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-pipe-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val path = s"/tmp/graft_probe_$nConvs.parquet"
    if (!new java.io.File(path).exists()) {
      TranscriptGen.generate(s, nConvs, seed = 42L, skewCap = 20000,
        partitions = 64).write.mode("overwrite").parquet(path)
    }
    val nTurns = s.read.parquet(path).count()

    def ds: Dataset[Turn] = s.read.schema(Turn.schema).parquet(path).as[Turn]
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm-up (codegen + JIT)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"""PIPEPROBE {"phase":"$label","min":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}],"turns":$nTurns,"cores":$cores}""")
    }

    s.sparkContext.setJobDescription("probe: scan only")
    time("scan")(noop(ds.toDF()))

    s.sparkContext.setJobDescription("probe: scan + normalizeWs")
    time("normalize") {
      noop(ds.mapPartitions { it =>
        it.map { t =>
          val n = graft.scrub.Scrub.normalizeWsPlain(t.text)
          (t.conv_id, if (n == null) 0 else n.length)
        }
      }.toDF("conv_id", "norm_len"))
    }

    s.sparkContext.setJobDescription("probe: scan + turnMetrics")
    time("metrics") {
      noop(ds.mapPartitions { it =>
        it.map { t =>
          val n = graft.scrub.Scrub.normalizeWsPlain(t.text)
          val (sd, h, rep) = graft.functions.TextAlgos.turnMetrics(n,
            graft.rules.RuleConfig.RepetitionOrder)
          (t.conv_id, sd, h, rep)
        }
      }.toDF("conv_id", "sd", "h", "rep"))
    }

    s.sparkContext.setJobDescription("probe: full score stage")
    time("score")(noop(QualityFilter.score(ds).toDF()))

    s.sparkContext.setJobDescription("probe: scrub_all only")
    time("scrub") {
      noop(ds.toDF().select(col("conv_id"),
        graft.functions.GraftExpressions.scrub_all(col("text")).as("sc")))
    }

    s.sparkContext.setJobDescription("probe: full pipeline")
    val full = QualityFilter.label(ds)
      .selectExpr("sum(length(scrubbed_text))", "sum(size(drop_reasons))",
        "count(*)")
    time("full")(noop(full))

    s.stop()
  }
}
