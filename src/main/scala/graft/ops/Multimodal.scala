package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAlgos

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side plumbing — schema,
  * partition-sized batching, feature schema — is real; the decoder is a
  * STUB (this container has no image/audio codecs): a deterministic
  * fake that derives "features" from the bytes, clearly marked, with
  * the decode seam isolated behind [[MediaDecoder]] so a real codec
  * (or a Python `mapInPandas` stage in a PySpark deployment) drops in.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      mime: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      sha_like: Long,
      brightness: Double, // STUB feature
      embedding: Array[Float]) // STUB feature

  /** The decode seam. The production implementation would wrap an image
    * library; tests and the sandbox use [[FakeDecoder]].
    */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB: deterministic pseudo-decoder — features are pure functions
    * of the payload bytes, so tests are stable and the distributed
    * plumbing (batching, schema, partitioning) is exercised for real.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = if (row.payload == null) Array.emptyByteArray else row.payload
      var h = 0xcbf29ce484222325L
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        h ^= bytes(i); h *= 0x100000001b3L
        sum += (bytes(i) & 0xff)
        i += 1
      }
      val sig = TextAlgos.mix64(h)
      val emb = new Array[Float](8)
      var d = 0
      while (d < 8) {
        emb(d) = ((TextAlgos.mix64(sig + d) >>> 40).toInt / 8388608.0f) - 1.0f
        d += 1
      }
      MediaFeatures(row.media_id, row.mime, bytes.length, sig,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0, emb)
    }
  }

  /** Distributed featurization: partition-batched decode (the Scala
    * analog of `mapInPandas` — one decoder instance per partition, rows
    * streamed through it), typed Dataset in/out, no driver collect.
    */
  def featurize(ds: Dataset[MediaRow],
                decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    ds.mapPartitions { it => it.map(decoder.decode) }
  }

  final case class FrameRow(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** The resize seam (production: an image library's scaler). The stub
    * deterministically downsamples the payload bytes to the target
    * pixel budget so the plumbing (schema, per-partition transform,
    * metadata rewrite) is exercised for real.
    */
  trait MediaResizer extends Serializable {
    def resize(row: MediaRow, w: Int, h: Int): MediaRow
  }

  object FakeResizer extends MediaResizer {
    def resize(row: MediaRow, w: Int, h: Int): MediaRow = {
      val src = if (row.payload == null) Array.emptyByteArray else row.payload
      val n = math.max(1, math.min(src.length, w * h / 16))
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = src((i.toLong * src.length / n).toInt); i += 1 }
      row.copy(width = w, height = h, payload = out)
    }
  }

  /** Distributed resize: one resizer per partition, metadata rewritten
    * with the payload.
    */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int,
             resizer: MediaResizer = FakeResizer): Dataset[MediaRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    ds.mapPartitions(_.map(resizer.resize(_, w, h)))
  }

  /** Frame sampling: video payloads explode into every-`stride`-th
    * frame (stub frames = fixed-width byte windows — a real decoder
    * drops in behind the same flatMap shape); non-video rows pass
    * through as their single frame 0. One input row fans out to
    * many output rows WITHOUT any driver involvement or shuffle.
    */
  def frameSample(ds: Dataset[MediaRow], stride: Int,
                  frameBytes: Int = 32): Dataset[FrameRow] = {
    require(stride >= 1)
    implicit val enc = org.apache.spark.sql.Encoders.product[FrameRow]
    ds.mapPartitions(_.flatMap { row =>
      val bytes = if (row.payload == null) Array.emptyByteArray else row.payload
      if (row.mime != null && row.mime.startsWith("video/")) {
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by stride).iterator.map { f =>
          FrameRow(row.media_id, f, row.width, row.height,
            bytes.slice(f * frameBytes, math.min((f + 1) * frameBytes, bytes.length)))
        }
      } else Iterator.single(FrameRow(row.media_id, 0, row.width, row.height, bytes))
    })
  }

  /** Synthesize a deterministic media table from any id column — the
    * sandbox stand-in for reading a real binary-column table.
    */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val n = 64 + (TextAlgos.mix64(id) & 0xFF).toInt
      val bytes = new Array[Byte](n)
      var i = 0
      while (i < n) { bytes(i) = (TextAlgos.mix64(id * 1000 + i) & 0xff).toByte; i += 1 }
      val mime = if (id % 3 == 0) "image/png" else if (id % 3 == 1) "audio/wav" else "video/mp4"
      MediaRow(id, mime, 16 + (id % 64).toInt, 16 + (id % 48).toInt, bytes)
    }
  }
}
