package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped snapshot table on plain Parquet (no Iceberg runtime
  * jar offline — SURVEY.md §7.4): versioned manifests + atomic version
  * pointer give append/overwrite-by-bucket semantics, snapshot reads,
  * and checkpoint-resume. The interface is deliberately minimal so a
  * real Iceberg catalog drops in behind it via config.
  *
  * Layout:
  *   <root>/data/bucket=<k>/part-*.parquet   (one dir per commit unit)
  *   <root>/_graft/manifest-v<N>.json        (snapshot N: completed buckets
  *                                            + per-file column stats)
  *   <root>/_graft/VERSION                   (current snapshot pointer,
  *                                            updated by atomic rename)
  *
  * Readers only see buckets listed in the current manifest, so a crash
  * mid-bucket leaves garbage files but never a dirty read (the
  * reference's table-snapshot copy, utils.py:1424-1441, reproduced as
  * snapshot isolation instead of a physical copy).
  *
  * FILE-LEVEL STATS (Iceberg's second scan-time win, after bucket
  * pruning): each commit records, per data file, the row count and
  * min/max of every string/int/timestamp column — read from the
  * PARQUET FOOTERS at commit time (the manifest-writer pattern: no
  * data pages are re-read, one footer per file on the committer).
  * [[readAt(spark,version,prune*)]] skips whole files whose bounds
  * cannot match a predicate — at the 10^12-turn tier this turns a
  * ts-range or conv-prefix query from "scan every file of every
  * bucket" into "open only the overlapping files". Timestamps are
  * written as INT64 micros (Iceberg's representation — INT96, Spark's
  * legacy default, carries no usable footer stats).
  */
final class SnapshotTable(val root: String, val nBuckets: Int) {
  import SnapshotTable._

  private val meta: Path = Paths.get(root, "_graft")
  private val versionFile: Path = meta.resolve("VERSION")

  Files.createDirectories(meta)
  Files.createDirectories(Paths.get(root, "data"))

  def currentVersion: Int =
    if (Files.exists(versionFile))
      new String(Files.readAllBytes(versionFile), StandardCharsets.UTF_8).trim.toInt
    else 0

  /** Buckets committed as of the current snapshot. Manifest format:
    * {"snapshot":N,"parent":M,"buckets":[1,2,...],"files":[...]}
    */
  def completedBuckets: Set[Int] = bucketsAt(currentVersion)

  /** Write one bucket's rows and commit it to a new snapshot. The data
    * write is idempotent (overwrite of the bucket dir); the commit is
    * the atomic VERSION rename — a re-run after a crash between the two
    * simply overwrites and re-commits.
    */
  def commitBucket(df: DataFrame, bucket: Int): Int = {
    // int64-micros timestamps for the bucket files: INT96 (Spark's
    // legacy parquet default) has no trustworthy footer min/max, which
    // would silently disable ts pruning; Iceberg mandates int64 micros
    // for the same reason. Restored afterwards — only this table's own
    // files need the guarantee.
    val conf = df.sparkSession.conf
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = conf.get(key)
    try {
      conf.set(key, "TIMESTAMP_MICROS")
      df.write.mode("overwrite").parquet(s"$root/data/bucket=$bucket")
    } finally conf.set(key, prior)
    commitBuckets(Set(bucket))
  }

  /** Record buckets (already written) in a new snapshot.
    *
    * Single-writer protocol (like Iceberg's optimistic commit): the
    * manifest is created with CREATE_NEW, so if two writers race to
    * produce manifest-v(N+1) the loser fails loudly
    * (FileAlreadyExistsException) instead of silently dropping the
    * winner's committed buckets via a last-rename-wins VERSION swap.
    *
    * File entries: freshly footer-scanned for `buckets`; carried
    * forward from the parent snapshot for previously committed buckets
    * (manifests are immutable, so the parent's entries are still true
    * for untouched bucket dirs).
    */
  def commitBuckets(buckets: Set[Int]): Int = {
    val v = currentVersion
    // allocate PAST the newest existing manifest: after a rollback the
    // divergent future manifests stay readable (time travel) until
    // expiry; the new commit's parent is the rolled-back snapshot
    val newV = math.max(v, snapshotHistory.lastOption.getOrElse(0)) + 1
    val all = (completedBuckets ++ buckets).toSeq.sorted
    val carried = filesAt(v).filterNot(f => buckets.contains(f.bucket))
    val fresh = buckets.toSeq.sorted.flatMap(scanBucketFooters)
    val files = carried ++ fresh

    val json = mapper.createObjectNode()
    json.put("snapshot", newV)
    json.put("parent", v)
    val barr = json.putArray("buckets")
    all.foreach(barr.add)
    val farr = json.putArray("files")
    files.foreach(f => farr.add(fileToJson(f)))

    Files.write(meta.resolve(s"manifest-v$newV.json"),
      mapper.writeValueAsBytes(json),
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

  /** Pruned snapshot read: only files whose manifest stats satisfy
    * `prune` are opened (plus, conservatively, every file of a bucket
    * with no recorded entries — a legacy manifest can never lose
    * rows). Compose the predicate from [[SnapshotTable.overlapsLong]] /
    * [[SnapshotTable.overlapsString]]; a file with no stats for the
    * probed column always survives.
    */
  def readAt(spark: SparkSession, version: Int, prune: DataFile => Boolean): DataFrame = {
    val done = bucketsAt(version)
    if (done.isEmpty) return spark.emptyDataFrame
    val byBucket = filesAt(version).filter(f => done.contains(f.bucket)).groupBy(_.bucket)
    val (fileBuckets, dirBuckets) = done.toSeq.sorted.partition { b =>
      // file-granularity pruning only when every manifest path still
      // exists: a later re-commit of the bucket (idempotent overwrite)
      // replaces its part files, and the dir-based fallback then gives
      // the same read-newest-data semantics the unpruned readAt has for
      // time travel over overwritten buckets (no deleted-path crash)
      byBucket.get(b).exists(_.forall(f => new java.io.File(s"$root/${f.path}").isFile))
    }
    val kept = fileBuckets.flatMap(b => byBucket(b).filter(prune))
      .map(f => s"$root/${f.path}")
    val paths = kept ++ dirBuckets.map(b => s"$root/data/bucket=$b")
    if (paths.isEmpty) {
      // all files pruned: preserve the snapshot's schema, zero rows
      readAt(spark, version).where(org.apache.spark.sql.functions.lit(false))
    } else spark.read.parquet(paths: _*)
  }

  def bucketsAt(version: Int): Set[Int] = manifestAt(version) match {
    case None => Set.empty
    case Some(m) =>
      val arr = m.get("buckets")
      if (arr == null || !arr.isArray) Set.empty
      else arr.elements().asScala.map(_.asInt()).toSet
  }

  /** Per-file manifest entries (path relative to `root`, row count,
    * column bounds) as of `version`; empty for pre-stats manifests.
    */
  def filesAt(version: Int): Seq[DataFile] = manifestAt(version) match {
    case None => Seq.empty
    case Some(m) =>
      val arr = m.get("files")
      if (arr == null || !arr.isArray) Seq.empty
      else arr.elements().asScala.map(jsonToFile).toSeq
  }

  private def manifestAt(version: Int): Option[ObjectNode] = {
    if (version <= 0) return None
    val f = meta.resolve(s"manifest-v$version.json")
    if (!Files.exists(f)) return None
    mapper.readTree(Files.readAllBytes(f)) match {
      case o: ObjectNode => Some(o)
      case _ => None
    }
  }

  /** Footer scan of one bucket dir → manifest entries. One footer read
    * per file, driver-side, no data pages touched (the cost Iceberg
    * writers pay inline at file-close).
    */
  private def scanBucketFooters(bucket: Int): Seq[DataFile] = {
    val dir = new java.io.File(s"$root/data/bucket=$bucket")
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    parts.toSeq.map { f =>
      val (rows, bounds) = readFooterStats(f.getAbsolutePath)
      DataFile(bucket, s"data/bucket=$bucket/${f.getName}", rows, bounds)
    }
  }

  // ----------------------------------------------------------- json codec

  private def fileToJson(f: DataFile): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("bucket", f.bucket)
    o.put("path", f.path)
    o.put("rows", f.rows)
    val cols = o.putObject("cols")
    f.bounds.toSeq.sortBy(_._1).foreach { case (name, b) =>
      val c = cols.putObject(name)
      b match {
        case LongBounds(mn, mx) => c.put("t", "l"); c.put("min", mn); c.put("max", mx)
        case StringBounds(mn, mx) => c.put("t", "s"); c.put("min", mn); c.put("max", mx)
      }
    }
    o
  }

  private def jsonToFile(n: com.fasterxml.jackson.databind.JsonNode): DataFile = {
    val bounds = Option(n.get("cols")).toSeq.flatMap { cols =>
      cols.properties().asScala.map { e =>
        val c = e.getValue
        val b = c.get("t").asText() match {
          case "l" => LongBounds(c.get("min").asLong(), c.get("max").asLong())
          case _ => StringBounds(c.get("min").asText(), c.get("max").asText())
        }
        e.getKey -> b
      }
    }.toMap
    DataFile(n.get("bucket").asInt(), n.get("path").asText(),
      n.get("rows").asLong(), bounds)
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

  /** Recursive delete (ignores failures — best-effort temp cleanup).
    * The single shared copy: seam roots, soak corpora, and drill roots
    * all clean up through this, so a behavior change (e.g. symlink
    * handling) lands once.
    */
  private[graft] def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(); ()
  }

  private val mapper = new ObjectMapper()

  /** Column min/max over a file's non-null values. String bounds
    * compare with String ordering (conv ids here are ASCII, where
    * UTF-8 byte order and String order agree); long bounds cover
    * int32/int64 columns including TIMESTAMP_MICROS (micros since
    * epoch).
    */
  sealed trait Bounds
  final case class LongBounds(min: Long, max: Long) extends Bounds
  final case class StringBounds(min: String, max: String) extends Bounds

  /** One data file's manifest entry; `path` is relative to the table
    * root. A column absent from `bounds` has no usable stats (missing
    * footer statistics, unsupported type) and never prunes.
    */
  final case class DataFile(bucket: Int, path: String, rows: Long,
                            bounds: Map[String, Bounds])

  /** Range-overlap predicates for [[SnapshotTable.readAt]] pruning:
    * true (keep the file) unless the recorded bounds PROVE the file
    * cannot contain a matching row. Rows with nulls never match a
    * range predicate, so null-only files (no non-null bounds recorded
    * as empty stats → bounds present from other blocks or absent)
    * stay conservative.
    */
  def overlapsLong(f: DataFile, column: String, lo: Long, hi: Long): Boolean =
    f.bounds.get(column) match {
      case Some(LongBounds(mn, mx)) => mx >= lo && mn <= hi
      case _ => true
    }

  def overlapsString(f: DataFile, column: String, lo: String, hi: String): Boolean =
    f.bounds.get(column) match {
      case Some(StringBounds(mn, mx)) =>
        utf8Compare(mx, lo) >= 0 && utf8Compare(mn, hi) <= 0
      case _ => true
    }

  /** Unsigned UTF-8 byte order — the order parquet computed the binary
    * min/max in (and Spark's UTF8String order). Comparing footer
    * bounds with Java's UTF-16 String order instead would mis-rank
    * values at/above U+FFFF against astral code points and could prune
    * a file that contains a matching row.
    */
  private[io] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Micros-since-epoch for a timestamp literal — the unit of
    * TIMESTAMP_MICROS long bounds. floorDiv: plain `/` truncates
    * toward zero and mis-places pre-epoch fractional seconds by up to
    * a second.
    */
  def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** (row count, column bounds) from one parquet footer. Bounds merge
    * across row groups; a row group with MISSING stats for a column
    * drops that column's bounds entirely (unprunable — never guess),
    * while a null-only row group (stats present, no non-null value)
    * contributes nothing and keeps the others' bounds valid.
    */
  private[io] def readFooterStats(absPath: String): (Long, Map[String, Bounds]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(absPath), new org.apache.hadoop.conf.Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // merge per-column bounds across row groups; `poisoned` marks
      // columns any block lacks trustworthy stats for
      val merged = scala.collection.mutable.Map.empty[String, Bounds]
      val poisoned = scala.collection.mutable.Set.empty[String]
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          // only top-level primitive columns (dotted paths are nested)
          val name = c.getPath.toDotString
          if (!name.contains('.')) {
            val stats = c.getStatistics
            val tn = c.getPrimitiveType.getPrimitiveTypeName
            val lt = c.getPrimitiveType.getLogicalTypeAnnotation
            val supported = tn == INT64 || tn == INT32 || (tn == BINARY &&
              lt == org.apache.parquet.schema.LogicalTypeAnnotation.stringType())
            if (supported) {
              if (stats == null || stats.isEmpty) poisoned += name
              else if (stats.hasNonNullValue) {
                val nb: Bounds = tn match {
                  case BINARY => StringBounds(
                    stats.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                    stats.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
                  case INT64 => LongBounds(
                    stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                    stats.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                  case _ => LongBounds(
                    stats.genericGetMin.asInstanceOf[java.lang.Integer].longValue(),
                    stats.genericGetMax.asInstanceOf[java.lang.Integer].longValue())
                }
                merged(name) = (merged.get(name), nb) match {
                  case (Some(LongBounds(mn, mx)), l: LongBounds) =>
                    LongBounds(math.min(mn, l.min), math.max(mx, l.max))
                  case (Some(StringBounds(mn, mx)), s: StringBounds) =>
                    // merge in the same unsigned-UTF-8 order parquet
                    // computed the per-block stats in
                    StringBounds(if (utf8Compare(s.min, mn) < 0) s.min else mn,
                      if (utf8Compare(s.max, mx) > 0) s.max else mx)
                  case _ => nb
                }
              }
              // null-only block: contributes no values, poisons nothing
            }
          }
        }
      }
      val bounds = (merged -- poisoned).toMap
      (rows, bounds)
    } finally reader.close()
  }
}
