package graft.tools

import org.apache.spark.sql.SparkSession

/** Headline-query micro-probe for the dd2/ann1 watch item
  * (BENCH/BASELINE.md): runs named SparkEntry queries N times each in
  * one session with the bench's exact config and prints EVERY run
  * time, so warm-up depth, steady-state level, and host-noise bursts
  * are distinguishable (the bench's two-warm/min-of-3 protocol only
  * publishes the min). Usage:
  *
  *   runMain graft.tools.HeadlineProbe [sfDir] [runs] [q1,q2,...]
  *
  * defaults: /root/testdata/sf0.1, 8 runs, the two watched queries +
  * a control at record level (q1).
  */
object HeadlineProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(8)
    val names = args.lift(2)
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("dd2_minhash_pairs", "ann1_brute_topk", "q1_pricing_agg"))

    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-headline-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(s, sf).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val times = (1 to runs).map(_ => once())
      // scalastyle:off println — probe output is the deliverable
      println(f"""{"headline_probe":{"query":"$name","runs":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}}""")
    }
    s.stop()
  }
}
