package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Distributed exact selection == Spark's single-buffer `percentile`
  * (both implement linear interpolation on true order statistics).
  */
class StatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sparkPercentiles(df: org.apache.spark.sql.DataFrame, c: String,
                               ps: Seq[Double]): Seq[Double] = {
    val row = df.agg(
      percentile(col(c), lit(ps.head)),
      ps.tail.map(p => percentile(col(c), lit(p))): _*).head()
    ps.indices.map(row.getDouble)
  }

  test("matches Spark percentile on lineitem prices") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Stats.exactPercentiles(li, "l_extendedprice", ps)
    val exp = sparkPercentiles(li, "l_extendedprice", ps)
    got.zip(exp).zip(ps).foreach { case ((g, e), p) =>
      assert(math.abs(g - e) <= math.ulp(e) * 4, s"p=$p: $g vs $e")
    }
  }

  test("exact on duplicates, skew, and tiny collect budgets (recursion)") {
    import spark.implicits._
    // heavy duplicate block + spread tail; maxCollect=64 forces the
    // histogram recursion path
    val vals = (Seq.fill(5000)(42.0) ++ (0 until 2000).map(i => i * 0.001) ++
      Seq.fill(100)(-7.5)).zipWithIndex.map(_.swap)
    val df = vals.toDF("id", "x").repartition(13)
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.99)
    val got = Stats.exactPercentiles(df, "x", ps, maxCollect = 64)
    val exp = sparkPercentiles(df, "x", ps)
    got.zip(exp).zip(ps).foreach { case ((g, e), p) =>
      assert(math.abs(g - e) <= math.ulp(e) * 4, s"p=$p: $g vs $e")
    }
    // all-equal column short-circuits
    assert(Stats.exactPercentiles(
      Seq.fill(100)(3.25).toDF("x"), "x", Seq(0.5)) == Seq(3.25))
    // empty column
    assert(Stats.exactPercentiles(
      spark.emptyDataset[Double].toDF("x"), "x", Seq(0.5)).head.isNaN)
  }
}
