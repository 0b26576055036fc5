package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows; every queries()
  * key has a matching oracleSql key or is intentionally rows-only.
  */
class EntrySmokeSpec extends AnyFunSuite {

  test("entry returns rows on sf0.001-equivalent input") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
    assert(df.columns.contains("keep") && df.columns.contains("scrubbed_text"))
  }

  test("every oracle key has a query; rows-only set is the intended one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    // ZERO rows-only queries: every query (model stages, LSH, real
    // image/audio decode, even the video stub via its constant-byte
    // payload) has a full DuckDB oracle
    val rowsOnly = q -- o
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }
}
