package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAlgos

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partition-sized batching, feature
  * schema — is real for every modality. IMAGE decode/resize are real:
  * [[ImageIoDecoder]]/[[ImageIoResizer]] run the JDK's bundled
  * PNG/JPEG/BMP/GIF codecs (`javax.imageio`), so width/height/
  * brightness/embedding for image mimes come from actual pixels. AUDIO
  * decode is real too: [[WavDecoder]] runs the JDK's bundled
  * WAV/AIFF/AU readers (`javax.sound.sampled`), so sample rate /
  * duration / RMS loudness / per-window energies come from actual PCM
  * samples. Only VIDEO has no JDK codec and remains a deterministic
  * STUB ([[FakeDecoder]]/[[FakeResizer]]) behind the same seams — a
  * real codec (or a Python `mapInPandas` stage in a PySpark
  * deployment) drops in behind [[MediaDecoder]].
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
      width: Int,  // decoded (ImageIoDecoder) or metadata (FakeDecoder)
      height: Int,
      sha_like: Long,
      brightness: Double, // image: mean RGB in [0,1]; audio: RMS loudness in [0,1]; STUB otherwise
      embedding: Array[Float], // image: strip-gray means; audio: per-window RMS; STUB otherwise
      sample_rate: Int = 0, // audio only (WavDecoder); 0 elsewhere
      duration_ms: Double = 0.0) // audio only; 0 elsewhere

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
      MediaFeatures(row.media_id, row.mime, bytes.length, row.width, row.height, sig,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0, emb)
    }
  }

  /** REAL image decoding via the JDK's bundled codecs (PNG/JPEG/BMP/GIF
    * — no external jars): decoded width/height, mean-RGB brightness in
    * [0,1], and an 8-dim embedding of per-vertical-strip gray means.
    * Non-image mimes (and undecodable payloads) fall back to the
    * declared stub so the pipeline never throws on a corrupt cell —
    * the corrupt case keeps the stub's byte-derived features.
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      if (row.mime == null || !row.mime.startsWith("image/") || row.payload == null)
        return FakeDecoder.decode(row)
      // NonFatal, not just IOException: corrupt headers can surface
      // RuntimeExceptions (IllegalArgumentException, NegativeArraySize…)
      // from JDK imaging plugins — the "never throws on a corrupt cell"
      // contract must hold for those too
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return FakeDecoder.decode(row)
      val w = img.getWidth
      val h = img.getHeight
      var sumRgb = 0L
      val stripSum = new Array[Long](8)
      val stripN = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          sumRgb += gray
          val strip = x * 8 / w
          stripSum(strip) += gray
          stripN(strip) += 1
          x += 1
        }
        y += 1
      }
      val fake = FakeDecoder.decode(row) // sha_like stays byte-derived
      val emb = new Array[Float](8)
      var d = 0
      while (d < 8) {
        emb(d) =
          if (stripN(d) == 0) 0.0f
          else (stripSum(d).toDouble / (3.0 * 255.0 * stripN(d))).toFloat
        d += 1
      }
      MediaFeatures(row.media_id, row.mime, row.payload.length, w, h,
        fake.sha_like, sumRgb.toDouble / (3.0 * 255.0 * w * h), emb)
    }
  }

  /** REAL audio decoding via the JDK's bundled `javax.sound.sampled`
    * readers (WAV/AIFF/AU — no external jars): sample rate, duration,
    * RMS loudness in [0,1] (reported in the `brightness` slot), and an
    * 8-dim embedding of per-time-window RMS energies. Handles signed
    * 16-bit PCM in either endianness (what the JDK's WAV/AIFF readers
    * produce for the common case); other encodings, non-audio mimes and
    * undecodable payloads fall back to the declared stub — NonFatal is
    * caught so a corrupt cell can never fail a task.
    */
  object WavDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      if (row.mime == null || !row.mime.startsWith("audio/") || row.payload == null)
        return FakeDecoder.decode(row)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        val fmt = in.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        if (!ok) return FakeDecoder.decode(row)
        val bytes = in.readAllBytes()
        in.close()
        val n = bytes.length / 2
        if (n == 0) return FakeDecoder.decode(row)
        val big = fmt.isBigEndian
        // per-sample normalized amplitude; 8 equal time windows for the
        // energy embedding (window w covers samples [w*n/8, (w+1)*n/8))
        val winSq = new Array[Double](8)
        val winN = new Array[Long](8)
        var sumSq = 0.0
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
          val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
          val x = ((hi << 8) | lo) / 32768.0
          val sq = x * x
          sumSq += sq
          val w = (i.toLong * 8 / n).toInt
          winSq(w) += sq
          winN(w) += 1
          i += 1
        }
        val emb = new Array[Float](8)
        var w = 0
        while (w < 8) {
          emb(w) = if (winN(w) == 0) 0.0f
            else math.sqrt(winSq(w) / winN(w)).toFloat
          w += 1
        }
        val frames = n / fmt.getChannels
        val fake = FakeDecoder.decode(row) // sha_like stays byte-derived
        MediaFeatures(row.media_id, row.mime, row.payload.length,
          row.width, row.height, fake.sha_like,
          math.sqrt(sumSq / n), emb,
          sample_rate = fmt.getSampleRate.toInt,
          duration_ms = frames * 1000.0 / fmt.getSampleRate)
      } catch { case scala.util.control.NonFatal(_) => FakeDecoder.decode(row) }
    }
  }

  /** Production default: dispatch by mime — real ImageIO for images,
    * real javax.sound.sampled for audio, declared stub for video (the
    * JDK ships no video codec; a real one drops in behind the same
    * seam).
    */
  object DefaultDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures =
      if (row.mime != null && row.mime.startsWith("image/")) ImageIoDecoder.decode(row)
      else if (row.mime != null && row.mime.startsWith("audio/")) WavDecoder.decode(row)
      else FakeDecoder.decode(row)
  }

  /** Distributed featurization: partition-batched decode (the Scala
    * analog of `mapInPandas` — one decoder instance per partition, rows
    * streamed through it), typed Dataset in/out, no driver collect.
    * Default decoder = real ImageIO for images, real WAV decode for
    * audio, stub for video.
    */
  def featurize(ds: Dataset[MediaRow],
                decoder: MediaDecoder = DefaultDecoder): Dataset[MediaFeatures] = {
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

  /** REAL image resize: decode via ImageIO, nearest-neighbor rescale
    * into a fresh RGB raster (deterministic — no platform-dependent
    * filtering), re-encode as PNG. Non-image/undecodable rows fall back
    * to [[FakeResizer]].
    */
  object ImageIoResizer extends MediaResizer {
    def resize(row: MediaRow, w: Int, h: Int): MediaRow = {
      if (row.mime == null || !row.mime.startsWith("image/") || row.payload == null)
        return FakeResizer.resize(row, w, h)
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
        if (img == null) return FakeResizer.resize(row, w, h)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val sy = (y.toLong * img.getHeight / h).toInt
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / w).toInt, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        row.copy(width = w, height = h, payload = bos.toByteArray, mime = "image/png")
      } catch {
        // corrupt payloads can throw RuntimeExceptions (not just
        // IOException) from JDK imaging plugins — never fail the task
        case scala.util.control.NonFatal(_) => FakeResizer.resize(row, w, h)
      }
    }
  }

  /** Distributed resize: one resizer per partition, metadata rewritten
    * with the payload. Default = real ImageIO rescale for images, stub
    * downsample for audio/video.
    */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int,
             resizer: MediaResizer = ImageIoResizer): Dataset[MediaRow] = {
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

  /** Deterministic solid-color RGB for a synthesized image id — simple
    * modular arithmetic so the DuckDB oracle can predict the decoded
    * brightness from the id alone.
    */
  def synthColor(id: Long): (Int, Int, Int) =
    (((id % 256) * 37 % 256).toInt, ((id % 256) * 59 % 256).toInt,
      ((id % 256) * 83 % 256).toInt)

  /** Deterministic square-wave parameters for a synthesized audio id —
    * the audio analog of [[synthColor]]. Amplitude/sample count are
    * simple modular arithmetic, and a ±A square wave has RMS exactly
    * A/32768 (every sample contributes the same square, and A²/2³⁰ and
    * its running sums are exactly representable doubles), so the DuckDB
    * oracle predicts the decoded loudness from the id alone.
    */
  def synthAudioParams(id: Long): (Int, Int) =
    (1024 + (id % 97).toInt * 256, // amplitude, < 32768
      800 + (id % 32).toInt * 40) // samples at 8 kHz → 100 + 5·(id%32) ms

  /** Real 16-bit mono PCM WAV bytes for a ±`amp` square wave (period 8
    * samples) of `n` samples at 8 kHz.
    */
  def synthWav(amp: Int, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if ((i / 4) % 2 == 0) amp else -amp
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic media table from any id column — the
    * sandbox stand-in for reading a real binary-column table. Image
    * rows carry REAL PNG payloads (encoded on the executor, solid
    * [[synthColor]] pixels at the metadata dimensions); audio rows
    * carry REAL WAV payloads ([[synthWav]] square waves, so decoded
    * loudness/duration are id-predictable); video payloads are
    * deterministic stub bytes (no JDK video codec).
    */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val w = 16 + (id % 64).toInt
      val h = 16 + (id % 48).toInt
      if (id % 3 == 0) {
        val (r, g, b) = synthColor(id)
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image/png", w, h, bos.toByteArray)
      } else if (id % 3 == 1) {
        val (amp, n) = synthAudioParams(id)
        MediaRow(id, "audio/wav", w, h, synthWav(amp, n))
      } else {
        // video has no JDK codec — payload is declared-stub bytes, but
        // CONSTANT-valued ((id % 200) in every byte, length
        // 64 + id % 192) so even the stub's byte-derived brightness
        // (mean byte / 255) is pure id arithmetic and the all-modality
        // mm1 query can be fully DuckDB-checked
        val n = 64 + (id % 192).toInt
        val bytes = new Array[Byte](n)
        java.util.Arrays.fill(bytes, (id % 200).toByte)
        MediaRow(id, "video/mp4", w, h, bytes)
      }
    }
  }
}
