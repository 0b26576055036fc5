package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped snapshot table on plain Parquet (no Iceberg runtime
  * jar offline — SURVEY.md §7.4): versioned manifests + atomic version
  * pointer give append/overwrite-by-bucket semantics, snapshot reads,
  * and checkpoint-resume. The interface is deliberately minimal so a
  * real Iceberg catalog drops in behind it via config.
  *
  * Layout:
  *   <root>/data/bucket=<k>/part-*.parquet   (one dir per commit unit)
  *   <root>/_graft/manifest-v<N>.json        (snapshot N: completed buckets)
  *   <root>/_graft/VERSION                   (current snapshot pointer,
  *                                            updated by atomic rename)
  *
  * Readers only see buckets listed in the current manifest, so a crash
  * mid-bucket leaves garbage files but never a dirty read (the
  * reference's table-snapshot copy, utils.py:1424-1441, reproduced as
  * snapshot isolation instead of a physical copy).
  */
final class SnapshotTable(val root: String, val nBuckets: Int) {
  private val meta: Path = Paths.get(root, "_graft")
  private val versionFile: Path = meta.resolve("VERSION")

  Files.createDirectories(meta)
  Files.createDirectories(Paths.get(root, "data"))

  def currentVersion: Int =
    if (Files.exists(versionFile))
      new String(Files.readAllBytes(versionFile), StandardCharsets.UTF_8).trim.toInt
    else 0

  /** Buckets committed as of the current snapshot. Manifest format:
    * {"snapshot":N,"parent":M,"buckets":[1,2,...]}
    */
  def completedBuckets: Set[Int] = bucketsAt(currentVersion)

  /** Write one bucket's rows and commit it to a new snapshot. The data
    * write is idempotent (overwrite of the bucket dir); the commit is
    * the atomic VERSION rename — a re-run after a crash between the two
    * simply overwrites and re-commits.
    */
  def commitBucket(df: DataFrame, bucket: Int): Int = {
    df.write.mode("overwrite").parquet(s"$root/data/bucket=$bucket")
    commitBuckets(Set(bucket))
  }

  /** Record buckets (already written) in a new snapshot.
    *
    * Single-writer protocol (like Iceberg's optimistic commit): the
    * manifest is created with CREATE_NEW, so if two writers race to
    * produce manifest-v(N+1) the loser fails loudly
    * (FileAlreadyExistsException) instead of silently dropping the
    * winner's committed buckets via a last-rename-wins VERSION swap.
    */
  def commitBuckets(buckets: Set[Int]): Int = {
    val v = currentVersion
    // allocate PAST the newest existing manifest: after a rollback the
    // divergent future manifests stay readable (time travel) until
    // expiry; the new commit's parent is the rolled-back snapshot
    val newV = math.max(v, snapshotHistory.lastOption.getOrElse(0)) + 1
    val all = (completedBuckets ++ buckets).toSeq.sorted
    val json =
      s"""{"snapshot":$newV,"parent":$v,"buckets":[${all.mkString(",")}]}"""
    Files.write(meta.resolve(s"manifest-v$newV.json"),
      json.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    val tmp = meta.resolve(s"VERSION.tmp$newV")
    Files.write(tmp, newV.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    newV
  }

  /** Snapshot read: only committed buckets are visible. */
  def read(spark: SparkSession): DataFrame = readAt(spark, currentVersion)

  /** Time-travel read of an earlier snapshot (Iceberg
    * `VERSION AS OF` semantics): only buckets committed as of
    * `version` are visible, regardless of later commits.
    */
  def readAt(spark: SparkSession, version: Int): DataFrame = {
    val done = bucketsAt(version)
    if (done.isEmpty) {
      spark.emptyDataFrame
    } else {
      val paths = done.toSeq.sorted.map(b => s"$root/data/bucket=$b")
      spark.read.parquet(paths: _*)
    }
  }

  def bucketsAt(version: Int): Set[Int] = {
    if (version <= 0) return Set.empty
    val f = meta.resolve(s"manifest-v$version.json")
    if (!Files.exists(f)) return Set.empty
    val txt = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    val m = "\"buckets\"\\s*:\\s*\\[([0-9,\\s]*)\\]".r
    m.findFirstMatchIn(txt) match {
      case Some(g) if g.group(1).trim.nonEmpty =>
        g.group(1).split(",").map(_.trim.toInt).toSet
      case _ => Set.empty
    }
  }

  /** Snapshot history: existing manifest versions, ascending. */
  def snapshotHistory: Seq[Int] = {
    val stream = Files.list(meta)
    val files =
      try stream.iterator().asScala.map(_.getFileName.toString).toSeq
      finally stream.close()
    files.collect { case s if s.startsWith("manifest-v") && s.endsWith(".json") =>
      s.stripPrefix("manifest-v").stripSuffix(".json").toInt
    }.sorted
  }

  /** Iceberg expire-snapshots: keep the newest `keepLast` manifests
    * plus (always) the current one — the current snapshot may be older
    * than the newest after a rollback. Data files are shared across
    * snapshots here (bucket dirs are only overwritten in place), so no
    * data deletion.
    */
  def expireSnapshots(keepLast: Int): Seq[Int] = {
    val hist = snapshotHistory
    val cur = currentVersion
    val drop = hist.dropRight(math.max(keepLast, 0)).filter(_ != cur)
    drop.foreach(v => Files.deleteIfExists(meta.resolve(s"manifest-v$v.json")))
    drop
  }

  /** Roll the current-version pointer back to an earlier snapshot
    * (Iceberg rollback): later snapshots' data stays on disk but
    * becomes invisible; the next commit builds on the rolled-back
    * state.
    */
  def rollbackTo(version: Int): Unit = {
    require(version >= 0 && (version == 0 ||
      Files.exists(meta.resolve(s"manifest-v$version.json"))),
      s"no snapshot v$version")
    val tmp = meta.resolve(s"VERSION.tmp.rb$version")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object SnapshotTable {
  def apply(root: String, nBuckets: Int): SnapshotTable =
    new SnapshotTable(root, nBuckets)
}
