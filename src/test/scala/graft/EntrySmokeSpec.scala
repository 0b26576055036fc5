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
    val rowsOnly = q -- o
    val expectedRowsOnly = Set(
      "mm1_multimodal_features") // audio/video stub features are not
                                 // SQL-predictable; mm2 oracle-checks
                                 // the real image-decode subset
    assert(rowsOnly == expectedRowsOnly,
      s"unexpected rows-only queries: ${rowsOnly -- expectedRowsOnly}; " +
        s"missing: ${expectedRowsOnly -- rowsOnly}")
  }
}
