package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corrections, Multimodal, SemanticTypes}
import graft.sources.Sources

/** Sources / semantic types / corrections / multimodal plumbing. */
class Ops2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("csv roundtrip with sanitized names + separator decode") {
    import spark.implicits._
    assert(Sources.decodeSeparator("Virgule") == ",")
    assert(Sources.decodeSeparator("Point virgule") == ";")
    assert(Sources.decodeSeparator("Tabulation") == "\t")
    assert(Sources.sanitizeName("2col name!") == "_ch2col_name_")
    assert(Sources.sanitizeName("ok_name") == "ok_name")

    val df = Seq((1, "a,b", "x"), (2, null, "y")).toDF("id", "payload", "3bad name")
    val path = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/t"
    Sources.exportCsv(df, path, Seq("id"))
    val back = Sources.readCsv(spark, path)
    assert(back.columns.toSeq == Seq("id", "payload", "_ch3bad_name"))
    assert(back.count() == 2)
    // '' -> null round-trip (reference parse_file semantics)
    assert(back.where(col("payload").isNull).count() == 1)
  }

  test("date classify + reformat") {
    import spark.implicits._
    val df = Seq("2024-03-09", "03/09/2024", "09.03.2024", "20240309", "not a date")
      .toDF("d")
    val got = df.select(
      SemanticTypes.classifyDateFormat(col("d")).as("fmt"),
      SemanticTypes.reformatDate(col("d")).as("fixed"))
      .as[(String, String)].collect().toSeq
    assert(got(0) == (("YYYY-MM-DD", "03-09-2024")))
    // %d/%m/%Y is tried before %m/%d/%Y (reference order): 03/09 = 3 Sep
    assert(got(1) == (("MM/DD/YYYY", "09-03-2024")))
    // reference label list (utils.py:1270-1275) has no DD.MM.YYYY label;
    // \d{2}.\d{2}.\d{4} is labelled MM.DD.YYYY — but the 14-format parse
    // list tries %d.%m.%Y before %m.%d.%Y, so 09.03.2024 parses as 9 Mar
    assert(got(2) == (("MM.DD.YYYY", "03-09-2024")))
    // bare YYYYMMDD is not one of the reference's 12 labels / 14 formats
    assert(got(3) == (("Format de date inconnu", "Format de date inconnu.")))
    assert(got(4)._1 == "Format de date inconnu")
    assert(got(4)._2 == "Format de date inconnu.")
  }

  test("majority type vote: precedence and thresholds") {
    import spark.implicits._
    val numeric = (0 until 30).map(i => (i.toLong, s"$i.5")).toDF("id", "v")
    assert(SemanticTypes.majorityType(numeric, "v", "id")
      .head().getString(0) == "numerique")
    val mixed = (0 until 30).map(i =>
      (i.toLong, if (i % 2 == 0) s"u$i@example.com" else "zzz")).toDF("id", "v")
    // 50% email: not > 0.6, not > 0.5 → UNKNOWN
    assert(SemanticTypes.majorityType(mixed, "v", "id")
      .head().getString(0) == "UNKNOWN")
  }

  test("corrections: capitalize is str.capitalize, not initcap") {
    import spark.implicits._
    val got = Seq("heLLo wOrld", "X", "").toDF("s")
      .select(Corrections.capitalize(col("s"))).as[String].collect().toSeq
    assert(got == Seq("Hello world", "X", ""))
  }

  test("corrections: currency, specials, spaces, null-out") {
    import spark.implicits._
    val df = Seq(("$1,234.50x", "  a   b ", "-")).toDF("m", "sp", "sent")
    val row = df.select(
      Corrections.currencyToNumber(col("m"), 2.0).as("c"),
      Corrections.fixSpaces(col("sp")).as("f"),
      Corrections.nullOut(col("sent"), col("sent") === "-").as("n"),
      Corrections.stripSpecials(lit("a@b c!")).as("st")).head()
    assert(row.getDouble(0) == 2469.0)
    assert(row.getString(1) == "a b")
    assert(row.isNullAt(2))
    assert(row.getString(3) == "abc")
  }

  test("duplicate column detection + split gate") {
    import spark.implicits._
    val df = Seq((1.0, 1.0, 2.0), (3.0, 3.0, 4.0)).toDF("a", "b", "c")
    assert(Corrections.duplicateColumnPairs(df, Seq("a", "b", "c")) == Seq(("a", "b")))
    val twoTok = Seq("x y", "p q", "m n", "solo").toDF("v")
    assert(Corrections.splittable(twoTok, "v"))
    val split = Corrections.splitColumn(twoTok, "v")
    assert(split.columns.toSeq == Seq("v_0", "v_1"))
  }

  test("multimodal featurize: deterministic, distributed, batch-shaped") {
    val media = Multimodal.synthesize(spark,
      spark.range(0, 40).toDF("id"), "id")
    val feats = Multimodal.featurize(media).collect().sortBy(_.media_id)
    assert(feats.length == 40)
    assert(feats.forall(f => f.embedding.length == 8))
    assert(feats.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    // determinism across repartitioning
    val feats2 = Multimodal.featurize(media.repartition(7))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.sha_like).toSeq == feats2.map(_.sha_like).toSeq)
    assert(feats.map(_.embedding.toSeq).toSeq == feats2.map(_.embedding.toSeq).toSeq)
    // mime typing from metadata
    assert(feats.map(_.mime).distinct.sorted.toSeq ==
      Seq("audio/wav", "image/png", "video/mp4"))

    // resize: metadata rewritten; image payloads re-encoded at the
    // target dims by the REAL ImageIO path, stub payloads downsampled
    // to the byte budget; deterministic across partitioning
    val resized = Multimodal.resize(media, 32, 32).collect().sortBy(_.media_id)
    assert(resized.forall(r => r.width == 32 && r.height == 32))
    resized.filterNot(_.mime == "image/png")
      .foreach(r => assert(r.payload.length <= 32 * 32 / 16))
    resized.filter(_.mime == "image/png").foreach { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == 32 && img.getHeight == 32)
    }
    val resized2 = Multimodal.resize(media.repartition(5), 32, 32)
      .collect().sortBy(_.media_id)
    assert(resized.map(_.payload.toSeq).toSeq == resized2.map(_.payload.toSeq).toSeq)

    // frame sampling: videos fan out to every-2nd frame, others pass
    // through as frame 0; no shuffle, no driver loop
    val frames = Multimodal.frameSample(media, stride = 2, frameBytes = 8).collect()
    val byMedia = frames.groupBy(_.media_id)
    val videos = media.collect().filter(_.mime == "video/mp4").map(_.media_id).toSet
    assert(videos.nonEmpty)
    videos.foreach { id =>
      val fs = byMedia(id).map(_.frame_idx).sorted
      assert(fs.head == 0 && fs.forall(_ % 2 == 0), s"video $id frames: ${fs.toSeq}")
      assert(fs.length > 1, s"video $id should sample multiple frames")
    }
    byMedia.filterNot(kv => videos(kv._1)).values
      .foreach(fs => assert(fs.map(_.frame_idx).toSeq == Seq(0)))
  }

  test("real image decode: ImageIO round-trips synthesized PNGs exactly") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, spark.range(0, 60).toDF("id"), "id")
      .filter(_.mime == "image/png")
    val feats = Multimodal.featurize(media, Multimodal.ImageIoDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.media_id
      assert(f.width == 16 + (id % 64).toInt, s"decoded width of $id")
      assert(f.height == 16 + (id % 48).toInt, s"decoded height of $id")
      val (r, g, b) = Multimodal.synthColor(id)
      assert(math.abs(f.brightness - (r + g + b) / 765.0) < 1e-12,
        s"decoded brightness of $id: ${f.brightness} vs ${(r + g + b) / 765.0}")
      // solid color → every vertical-strip mean equals the global mean
      f.embedding.foreach(e => assert(math.abs(e - f.brightness) < 1e-6))
    }
    // audio/video rows keep the declared stub features
    val av = Multimodal.synthesize(spark, spark.range(0, 9).toDF("id"), "id")
      .filter(_.mime != "image/png")
    val stub = Multimodal.featurize(av, Multimodal.ImageIoDecoder).collect()
    val fake = Multimodal.featurize(av, Multimodal.FakeDecoder).collect()
    assert(stub.sortBy(_.media_id).map(_.brightness).toSeq ==
      fake.sortBy(_.media_id).map(_.brightness).toSeq)
  }

  test("real audio decode: javax.sound round-trips synthesized WAVs exactly") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, spark.range(0, 60).toDF("id"), "id")
      .filter(_.mime == "audio/wav")
    val feats = Multimodal.featurize(media, Multimodal.WavDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val (amp, n) = Multimodal.synthAudioParams(f.media_id)
      assert(f.sample_rate == 8000, s"sample rate of ${f.media_id}")
      assert(f.duration_ms == n * 1000.0 / 8000.0, s"duration of ${f.media_id}")
      // ±A square wave → RMS is EXACTLY A/32768 (exactly representable)
      assert(f.brightness == amp / 32768.0,
        s"rms of ${f.media_id}: ${f.brightness} vs ${amp / 32768.0}")
      // constant-amplitude wave → every time-window RMS equals the global
      f.embedding.foreach(e => assert(math.abs(e - f.brightness) < 1e-6))
    }
    // determinism across repartitioning
    val feats2 = Multimodal.featurize(media.repartition(5), Multimodal.WavDecoder)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.brightness).toSeq == feats2.map(_.brightness).toSeq)

    // corrupt payloads and foreign mimes fall back to the stub without
    // throwing (NonFatal guard): garbage bytes under an audio mime
    val corrupt = media.map(r => r.copy(payload = r.payload.take(11)))
    val cf = Multimodal.featurize(corrupt, Multimodal.WavDecoder).collect()
    val ff = Multimodal.featurize(corrupt, Multimodal.FakeDecoder).collect()
    assert(cf.sortBy(_.media_id).map(_.brightness).toSeq ==
      ff.sortBy(_.media_id).map(_.brightness).toSeq)
    // DefaultDecoder dispatch: image→ImageIO, audio→Wav, video→stub
    val all = Multimodal.synthesize(spark, spark.range(0, 30).toDF("id"), "id")
    val byDefault = Multimodal.featurize(all).collect().sortBy(_.media_id)
    byDefault.foreach { f =>
      if (f.mime == "audio/wav") assert(f.sample_rate == 8000)
      else assert(f.sample_rate == 0)
    }
  }
}
