package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, TextAlgos}
import graft.io.SnapshotTable

/** SQL-function registration via the extension hook + snapshot-table
  * time travel / rollback.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("custom expressions callable from SQL after registration") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw,
                repetition_ratio('aaaaaaaaaa', 3) AS rep,
                symbol_density('a@b@c') AS sym,
                ngram_jaccard('a b c', 'a b d', 2) AS jac,
                doc_fingerprint('The  quick fox') = doc_fingerprint('the quick FOX') AS fp_stable,
                scrub_all('mail alice@example.com now').scrubbed_text AS scrubbed
      """).head()
    assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(row.getDouble(1) < 0.3)
    assert(row.getDouble(2) > 0.3)
    assert(row.getDouble(3) > 0.0 && row.getDouble(3) < 1.0)
    assert(row.getBoolean(4))
    assert(row.getString(5) == "mail <EMAIL> now")
  }

  test("snapshot time travel and rollback") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tt").toString
    val t = SnapshotTable(root, 4)
    t.commitBucket(Seq((1, "a")).toDF("k", "v"), 0) // v1
    t.commitBucket(Seq((2, "b")).toDF("k", "v"), 1) // v2
    assert(t.currentVersion == 2)
    assert(t.read(spark).count() == 2)
    assert(t.readAt(spark, 1).count() == 1) // time travel
    assert(t.readAt(spark, 0).isEmpty)

    t.rollbackTo(1)
    assert(t.currentVersion == 1)
    assert(t.read(spark).count() == 1)
    // next commit builds on the rolled-back state (parent = v1); it is
    // allocated PAST the divergent v2, which stays time-travel-readable
    t.commitBucket(Seq((3, "c")).toDF("k", "v"), 2) // v3, parent 1
    assert(t.completedBuckets == Set(0, 2))
    assert(t.currentVersion == 3)
    assert(t.readAt(spark, 2).count() == 2) // divergent branch still readable
    intercept[IllegalArgumentException](t.rollbackTo(99))
  }
}
