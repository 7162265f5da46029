package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

class MultimodalSpec extends SparkSpec {

  private def mediaDF = {
    import spark.implicits._
    Seq(
      (1L, Array[Byte](1, 44, 0, 100, 5, 6, 7, 8, 9, 10)),
      (2L, Array[Byte](-1, -1, -1, -1)),
      (3L, Array.emptyByteArray))
      .toDF("media_id", "content")
  }

  test("decode stub: schema + deterministic metadata") {
    val out = Multimodal.withMediaMeta(mediaDF, "content")
    assert(out.schema.fieldNames.contains("media_meta"))
    val rows = out.orderBy("media_id").select("media_meta.*").collect()
    assert(rows(0).getString(0) == "fmt1" && rows(0).getInt(1) == (1 << 8 | 44))
    assert(rows(0).getInt(2) == 100 && rows(0).getLong(3) == 10)
    assert(rows(2).getLong(3) == 0, "empty blob -> zero-byte meta")
  }

  test("feature stub: normalized histogram, stable across runs") {
    val f1 = Multimodal.withFeatures(mediaDF, "content")
      .orderBy("media_id").select("features").collect()
    val f2 = Multimodal.withFeatures(mediaDF, "content")
      .orderBy("media_id").select("features").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    val h = f1(0).getSeq[Float](0)
    assert(h.length == 16 && math.abs(h.sum - 1.0) < 1e-5, "histogram sums to 1")
    assert(f1(2).getSeq[Float](0).sum == 0f, "empty blob -> zero vector")
  }

  test("columnar variants == mapPartitions variants; codegen plan") {
    Graft.install(spark)
    // features: native byte_histogram matches the stub row for row
    val a = Multimodal.withFeatures(mediaDF, "content")
      .orderBy("media_id").select("media_id", "features")
      .collect().map(_.toString).toSeq
    val colVariant = Multimodal.withFeaturesColumnar(mediaDF, "content")
    val b = colVariant.orderBy("media_id").select("media_id", "features")
      .collect().map(_.toString).toSeq
    assert(a == b, "byte_histogram expression == featureStub")
    // local literal data constant-folds; assert the plan on a computed
    // (non-foldable) binary input instead
    val computed = Multimodal.withFeaturesColumnar(
      spark.range(8).select(col("id").as("media_id"),
        unhex(md5(col("id").cast("string"))).as("content")), "content")
    computed.collect()
    assert(computed.queryExecution.executedPlan.toString
      .contains("byte_histogram"), "native expression in the plan")
    // null payload: zero vector like the stub
    import spark.implicits._
    val withNull = Seq((9L, null: Array[Byte])).toDF("media_id", "content")
    val z = Multimodal.withFeaturesColumnar(withNull, "content")
      .select("features").collect()(0).getSeq[Float](0)
    assert(z.length == 16 && z.sum == 0f)
    // media meta: header arithmetic as pure columns, same rows
    val m1 = Multimodal.withMediaMeta(mediaDF, "content")
      .orderBy("media_id").select("media_meta.*").collect().map(_.toString).toSeq
    val m2 = Multimodal.withMediaMetaColumnar(mediaDF, "content")
      .orderBy("media_id").select("media_meta.*").collect().map(_.toString).toSeq
    assert(m1 == m2, "columnar header decode == decodeStub")
  }

  test("real image decode: ImageIO header metadata for PNG/JPEG, stub fallback beside it") {
    import spark.implicits._
    // generate genuine image bytes in-test (ImageIO is part of the JDK)
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JVM can encode $fmt")
      bos.toByteArray
    }
    val df = Seq(
      (1L, imageBytes("png", 17, 9)),
      (2L, imageBytes("jpg", 5, 31)),
      (3L, Array[Byte](1, 44, 0, 100, 5, 6, 7, 8, 9, 10)), // not an image
      (4L, null: Array[Byte]))
      .toDF("media_id", "content")
    val rows = Multimodal.withMediaMeta(df, "content")
      .orderBy("media_id").select("media_meta.*").collect()
    assert(rows(0).getString(0) == "png" &&
      rows(0).getInt(1) == 17 && rows(0).getInt(2) == 9,
      "real PNG dimensions from the header")
    assert(rows(1).getString(0).startsWith("jp") &&
      rows(1).getInt(1) == 5 && rows(1).getInt(2) == 31,
      "real JPEG dimensions from the header")
    assert(rows(2).getString(0) == "fmt1" && rows(2).getInt(1) == (1 << 8 | 44),
      "unrecognized payload falls back to the deterministic stub")
    assert(rows(3).getString(0) == null && rows(3).getLong(3) == 0L,
      "null payload -> null meta, zero bytes")
  }

  test("real audio decode: javax.sound WAV header metadata, stub fallback beside it") {
    import spark.implicits._
    // generate a genuine 1-second 16 kHz mono WAV in-test (javax.sound
    // is part of the JDK, same as ImageIO)
    def wavBytes(rateHz: Int, channels: Int, seconds: Double): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, channels, true, false)
      val nFrames = (rateHz * seconds).toLong
      val pcm = new Array[Byte]((nFrames * channels * 2).toInt)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, wavBytes(16000, 1, 1.0)),
      (2L, wavBytes(8000, 2, 0.25)),
      (3L, Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9)), // not audio
      (4L, null: Array[Byte]))
      .toDF("media_id", "content")
    val rows = Multimodal.withAudioMeta(df, "content")
      .orderBy("media_id").select("audio_meta.*").collect()
    assert(rows(0).getString(0) == "wave" && rows(0).getInt(1) == 1 &&
      rows(0).getFloat(2) == 16000f && rows(0).getInt(3) == 16 &&
      rows(0).getLong(4) == 16000L &&
      math.abs(rows(0).getDouble(5) - 1.0) < 1e-6,
      "real WAV header: container, channels, rate, depth, frames, duration")
    assert(rows(1).getInt(1) == 2 && rows(1).getFloat(2) == 8000f &&
      rows(1).getLong(4) == 2000L,
      "stereo 8 kHz quarter-second clip decodes from its header")
    assert(rows(2).getString(0) == "pcmstub",
      "unrecognized payload falls back to the deterministic stub")
    // stub determinism: same bytes -> same fake header
    assert(Multimodal.audioStub(Array[Byte](9, 9, 9)) ==
      Multimodal.audioStub(Array[Byte](9, 9, 9)))
    assert(rows(3).getString(0) == null && rows(3).getLong(6) == 0L,
      "null payload -> null meta, zero bytes")
  }

  test("real video decode: ISO-BMFF box walk for MP4 headers, stub fallback beside it") {
    import spark.implicits._
    // hand-assemble a minimal valid MP4 (ISO/IEC 14496-12): length-
    // prefixed boxes are the whole format, so a spec-true file fits in
    // a few hundred bytes
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u64(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def mp4(brand: String, timescale: Long, durationUnits: Long,
            w: Int, h: Int, v1: Boolean): Array[Byte] = {
      val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ u32(0) ++
        "isom".getBytes("US-ASCII"))
      val mvhd =
        if (v1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++
          u32(timescale) ++ u64(durationUnits) ++ new Array[Byte](80))
        else box("mvhd", new Array[Byte](4) ++ u32(0) ++ u32(0) ++
          u32(timescale) ++ u32(durationUnits) ++ new Array[Byte](80))
      // tkhd v0: ver+flags(4) creation/mod/id/res/duration(20)
      // reserved(8) layer/alt/vol/res(8) matrix(36) then 16.16 dims
      val tkhd = box("tkhd", new Array[Byte](76) ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16))
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd)) ++
        box("mdat", Array[Byte](1, 2, 3))
    }
    val df = Seq(
      (1L, mp4("isom", 1000L, 5000L, 640, 360, v1 = false)),
      (2L, mp4("mp42", 90000L, 45000L, 1920, 1080, v1 = true)),
      (3L, Array[Byte](8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8)), // not a video
      (4L, null: Array[Byte]))
      .toDF("media_id", "content")
    val rows = Multimodal.withVideoMeta(df, "content")
      .orderBy("media_id").select("video_meta.*").collect()
    assert(rows(0).getString(0) == "isom" && rows(0).getInt(1) == 640 &&
      rows(0).getInt(2) == 360 && rows(0).getLong(3) == 1000L &&
      math.abs(rows(0).getDouble(4) - 5.0) < 1e-9,
      "v0 boxes: brand, 16.16 track dims, mvhd timescale/duration")
    assert(rows(1).getString(0) == "mp42" && rows(1).getInt(1) == 1920 &&
      rows(1).getInt(2) == 1080 &&
      math.abs(rows(1).getDouble(4) - 0.5) < 1e-9,
      "v1 boxes read their 64-bit duration at the shifted offsets")
    assert(rows(2).getString(0) == "rawstub",
      "non-ISO-BMFF payload falls back to the deterministic stub")
    assert(Multimodal.videoStub(Array[Byte](8, 8, 8)) ==
      Multimodal.videoStub(Array[Byte](8, 8, 8)), "stub determinism")
    assert(rows(3).getString(0) == null && rows(3).getLong(5) == 0L,
      "null payload -> null meta, zero bytes")
    // audio-only ISO-BMFF (no video trak): real parse, honest 0x0 dims
    val m4a = mp4("M4A ", 600L, 600L, 0, 0, v1 = false)
    val r = Multimodal.decodeVideo(m4a).get
    assert(r.getString(0) == "M4A" && r.getInt(1) == 0 && r.getInt(2) == 0 &&
      math.abs(r.getDouble(4) - 1.0) < 1e-9)
    // truncated moov: structural corruption -> None, not garbage fields
    val cut = mp4("isom", 1000L, 5000L, 640, 360, v1 = false)
    assert(Multimodal.decodeVideo(cut.take(cut.length - 40)).isEmpty)
  }

  test("mp4_meta: columnar twin agrees with decodeVideo byte-for-byte " +
    "and stays inside codegen") {
    import spark.implicits._
    Graft.install(spark)
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u64(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xffffffffL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def mp4(brand: String, timescale: Long, durationUnits: Long,
            w: Int, h: Int, v1: Boolean): Array[Byte] = {
      val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ u32(0) ++
        "isom".getBytes("US-ASCII"))
      val mvhd =
        if (v1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++
          u32(timescale) ++ u64(durationUnits) ++ new Array[Byte](80))
        else box("mvhd", new Array[Byte](4) ++ u32(0) ++ u32(0) ++
          u32(timescale) ++ u32(durationUnits) ++ new Array[Byte](80))
      val tkhd = box("tkhd", new Array[Byte](76) ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16))
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd)) ++
        box("mdat", Array[Byte](1, 2, 3))
    }
    val v0 = mp4("isom", 1000L, 5000L, 640, 360, v1 = false)
    val v1b = mp4("mp42", 90000L, 45000L, 1920, 1080, v1 = true)
    // 700 units at timescale 600 → floored 1_166_666 micros (the
    // overflow-safe split division, not a double round-trip)
    val frac = mp4("M4A ", 600L, 700L, 0, 0, v1 = false)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> v0, 2L -> v1b, 3L -> frac,
      4L -> "sixteen bytes of not-a-video!!!".getBytes("UTF-8"))
    val out = rows.toDF("id", "content").repartition(2)
      .select(col("id"), Graft.mp4Meta(col("content")).as("v"))
    val got = out.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getStruct(1).toSeq))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Seq("isom", 640, 360, 1000L, 5000000L)),
      (2L, Seq("mp42", 1920, 1080, 90000L, 500000L)),
      (3L, Seq("M4A", 0, 0, 600L, 1166666L)),
      (4L, null)), s"got $got")
    // the row decoder sees the SAME values (one shared parser); its
    // double duration agrees with the expression's floored micros
    for ((bytes, micros) <- Seq(v0 -> 5000000L, v1b -> 500000L,
        frac -> 1166666L)) {
      val r = Multimodal.decodeVideo(bytes).get
      assert((r.getDouble(4) * 1e6).toLong == micros)
    }
    // rejected inputs stay rejected in BOTH surfaces
    val cut = v0.take(v0.length - 40)
    assert(Multimodal.decodeVideo(cut).isEmpty &&
      graft.functions.VideoWire.bmffRow(cut) == null)
    // the expression lives inside a whole-stage-codegen span
    val dist = out.filter(col("v").isNotNull)
    assert(dist.collect().length == 3)
    val plan = dist.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined &&
      plan.contains("mp4_meta"),
      s"expected mp4_meta inside a codegen stage:\n$plan")
  }

  test("real image resize: aspect-preserving bound, PNG re-encode, stub beside it") {
    import spark.implicits._
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val small = imageBytes("png", 10, 8) // already fits -> returned verbatim
    val df = Seq(
      (1L, imageBytes("png", 64, 48)),
      (2L, imageBytes("png", 48, 64)),
      (3L, small),
      (4L, Array.tabulate[Byte](5000)(i => (i % 101).toByte)), // not an image
      (5L, null: Array[Byte]))
      .toDF("media_id", "content")
    val out = Multimodal.resizeImages(df, "content", 32, 32)
      .orderBy("media_id").select("media_id", "resized").collect()
    def dims(bytes: Array[Byte]) = {
      val r = Multimodal.decodeImage(bytes).get
      (r.getInt(1), r.getInt(2))
    }
    assert(dims(out(0).getAs[Array[Byte]](1)) == (32, 24),
      "landscape 64x48 -> 32x24 inside a 32x32 box")
    assert(dims(out(1).getAs[Array[Byte]](1)) == (24, 32),
      "portrait 48x64 -> 24x32 inside a 32x32 box")
    assert(out(2).getAs[Array[Byte]](1).sameElements(small),
      "image already inside the box -> original bytes, no re-encode")
    val stubbed = out(3).getAs[Array[Byte]](1)
    assert(stubbed.length <= 32 * 32 && stubbed(0) == 0,
      "non-image payload stride-sampled to at most maxW*maxH bytes")
    assert(out(4).getAs[Array[Byte]](1).isEmpty,
      "null payload -> empty resized blob")
  }

  test("frame sampling: explode shape and bounds") {
    import spark.implicits._
    val big = Seq((1L, Array.tabulate[Byte](1024)(i => (i % 127).toByte)))
      .toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(big, "content", frameSize = 64, stride = 4)
    assert(frames.count() == 4, "1024 bytes / (64*4) = 4 frames")
    val r = frames.orderBy("frame_idx").collect()
    assert(r(0).getInt(2) == 0 && r(0).getAs[Array[Byte]](3).length == 64)
  }

  test("real frame extraction: animated GIF frames decoded, stub beside it") {
    import spark.implicits._
    // write a genuine 5-frame animated GIF in-test via ImageIO's
    // sequence writer (GIF encode+decode are both in the JDK)
    def animatedGif(nFrames: Int, w: Int, h: Int): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until nFrames).foreach { i =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, i * 0x112233) // frames differ
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    val gif = animatedGif(5, 12, 7)
    val df = Seq(
      (1L, gif),
      (2L, Array.tabulate[Byte](1024)(i => (i % 127).toByte))) // not a gif
      .toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(df, "content", frameSize = 64, stride = 2)
      .orderBy("media_id", "frame_idx")
      .select("media_id", "frame_idx", "frame").collect()
    val gifFrames = frames.filter(_.getLong(0) == 1L)
    assert(gifFrames.map(_.getInt(1)).toSeq == Seq(0, 2, 4),
      "every stride-th frame of the 5-frame sequence, true indices")
    gifFrames.foreach { fr =>
      val meta = Multimodal.decodeImage(fr.getAs[Array[Byte]](2)).get
      assert(meta.getString(0) == "png" &&
        meta.getInt(1) == 12 && meta.getInt(2) == 7,
        "extracted frames are real decoded images at the GIF's dimensions")
    }
    assert(frames.count(_.getLong(0) == 2L) == 8,
      "non-GIF payload still byte-slices: 1024/(64*2) = 8 stub frames")
    // single-frame GIF degenerates to one real frame
    assert(Multimodal.extractGifFrames(animatedGif(1, 3, 3), 2).get.size == 1)
  }

  test("real audio features: PCM decode with known-signal statistics, stub beside it") {
    import spark.implicits._
    // half-scale square wave at 16-bit: rms = peak = 0.5 exactly, and
    // the sign flips every sample so zero-cross rate = 1
    def squareWav(rateHz: Int, n: Int, amp: Short, bigEndian: Boolean): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        rateHz.toFloat, 16, 1, true, bigEndian)
      val pcm = new Array[Byte](n * 2)
      (0 until n).foreach { i =>
        val v = if (i % 2 == 0) amp else (-amp).toShort
        val (lo, hi) = if (bigEndian) (i * 2 + 1, i * 2) else (i * 2, i * 2 + 1)
        pcm(lo) = (v & 0xff).toByte; pcm(hi) = ((v >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, squareWav(8000, 800, 16384, bigEndian = false)),
      (2L, Array[Byte](7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7)), // not audio
      (3L, null: Array[Byte]))
      .toDF("media_id", "content")
    val rows = Multimodal.withAudioFeatures(df, "content")
      .orderBy("media_id").select("audio_features.*").collect()
    assert(math.abs(rows(0).getDouble(0) - 0.5) < 1e-9 &&
      math.abs(rows(0).getDouble(1) - 0.5) < 1e-9,
      "real PCM decode: half-scale square wave has rms = peak = 0.5")
    assert(math.abs(rows(0).getDouble(2) - 1.0) < 1e-9 &&
      rows(0).getLong(3) == 800L,
      "alternating signs -> zero-cross rate 1.0 over 800 samples")
    // byte-order independence: the same signal big-endian decodes equal
    val be = Multimodal.audioFeatures(
      squareWav(8000, 800, 16384, bigEndian = true)).get
    assert(math.abs(be.getDouble(0) - 0.5) < 1e-9 && be.getLong(3) == 800L)
    // amplitude scales linearly: quarter-scale square wave -> rms 0.25
    val dc = Multimodal.audioFeatures(squareWav(8000, 4, 8192, false))
    assert(math.abs(dc.get.getDouble(0) - 0.25) < 1e-9)
    // non-audio payload: deterministic stub over raw bytes
    assert(rows(1).getLong(3) == 13L && rows(1).getDouble(1) == 7.0 / 128,
      "stub treats bytes as signed 8-bit samples")
    assert(Multimodal.audioFeatureStub(Array[Byte](7, 7)) ==
      Multimodal.audioFeatureStub(Array[Byte](7, 7)), "stub determinism")
    assert(rows(2).isNullAt(0) && rows(2).getLong(3) == 0L,
      "null payload -> null stats, zero samples")
  }

  test("binaryFile source ingests a directory") {
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array[Byte](4, 5))
    val df = Multimodal.readBinaryDir(spark, dir.toString, "*.bin")
    assert(df.count() == 2)
    assert(df.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
  }

  /** Minimal JPEG carrying an EXIF APP1 with one IFD0 entry: the
    * orientation SHORT. Assembled byte-by-byte so the parser is tested
    * against the real wire layout (both TIFF byte orders), not a
    * library's idea of it.
    */
  private def exifJpeg(orientation: Int, littleEndian: Boolean,
                       tiffType: Int = 3): Array[Byte] = {
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
      else { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (littleEndian) { w16(v & 0xffff); w16(v >>> 16) }
      else { w16(v >>> 16); w16(v & 0xffff) }
    tiff.write(if (littleEndian) 'I' else 'M')
    tiff.write(if (littleEndian) 'I' else 'M')
    w16(42); w32(8)           // magic, IFD0 at offset 8
    w16(1)                    // one entry
    w16(0x0112); w16(tiffType); w32(1) // tag, type, count 1
    if (tiffType == 4) w32(orientation)  // LONG fills the value field
    else { w16(orientation); w16(0) }    // SHORT: first two bytes
    w32(0)                    // next-IFD pointer: none
    val t = tiff.toByteArray
    val app1Len = 2 + 6 + t.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)          // SOI
    out.write(0xff); out.write(0xe1)          // APP1
    out.write((app1Len >> 8) & 0xff); out.write(app1Len & 0xff)
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    out.write(t)
    out.write(0xff); out.write(0xd9)          // EOI
    out.toByteArray
  }

  test("webp: real dims from hand-assembled VP8X / VP8L / VP8 headers") {
    import spark.implicits._
    def riff(tag: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val sz = 4 + 8 + payload.length
      out.write(sz & 0xff); out.write((sz >> 8) & 0xff)
      out.write((sz >> 16) & 0xff); out.write((sz >> 24) & 0xff)
      out.write("WEBP".getBytes("US-ASCII"))
      out.write(tag.getBytes("US-ASCII"))
      out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
      out.write((payload.length >> 16) & 0xff)
      out.write((payload.length >> 24) & 0xff)
      out.write(payload)
      out.toByteArray
    }
    // VP8X: flags(4) + 24-bit LE (w-1, h-1): 640x480
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0,
      (639 & 0xff).toByte, ((639 >> 8) & 0xff).toByte, 0,
      (479 & 0xff).toByte, ((479 >> 8) & 0xff).toByte, 0))
    // VP8L: 0x2f then 14-bit packed (w-1)=99, (h-1)=49: 100x50
    val p = 99L | (49L << 14)
    val vp8l = riff("VP8L", Array(0x2f.toByte, (p & 0xff).toByte,
      ((p >> 8) & 0xff).toByte, ((p >> 16) & 0xff).toByte,
      ((p >> 24) & 0xff).toByte, 0, 0, 0, 0, 0))
    // VP8 lossy: 3 tag bytes, start code 9d 01 2a, 14-bit w=320 h=240
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, ((320 >> 8) & 0xff).toByte,
      (240 & 0xff).toByte, ((240 >> 8) & 0xff).toByte, 0, 0, 0, 0))
    val out = Multimodal.withMediaMeta(
        Seq((1L, vp8x), (2L, vp8l), (3L, vp8)).toDF("id", "content"),
        "content")
      .select(col("id"), col("media_meta.format"), col("media_meta.width"),
        col("media_meta.height"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "webp", 640, 480), (2L, "webp", 100, 50),
      (3L, "webp", 320, 240)))
    // a RIFF that is not WEBP (plain WAV) must NOT claim webp
    assert(Multimodal.decodeWebp(
      "RIFF    WAVEfmt ................".getBytes("ISO-8859-1")).isEmpty)
  }

  test("webp: declared-size and minimal-file edges") {
    def riff2(tag: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val sz = 4 + 8 + payload.length
      out.write(sz & 0xff); out.write((sz >> 8) & 0xff)
      out.write((sz >> 16) & 0xff); out.write((sz >> 24) & 0xff)
      out.write("WEBP".getBytes("US-ASCII"))
      out.write(tag.getBytes("US-ASCII"))
      out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
      out.write((payload.length >> 16) & 0xff)
      out.write((payload.length >> 24) & 0xff)
      out.write(payload)
      out.toByteArray
    }
    // a truncated VP8 chunk (declared size 4 < the 10 header bytes we
    // read) must yield None even if padding happens to hold the start
    // code -- never garbage dims from beyond the declared payload
    val truncated = riff2("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01,
      0x2a, 0x40, 0x01, 0xf0.toByte, 0, 0, 0, 0, 0))
    truncated(16) = 4 // overwrite the declared chunk size
    assert(Multimodal.decodeWebp(truncated).isEmpty)
    // the 25-byte minimal VP8L (the 1x1 tracking-pixel shape) decodes
    val onePix = riff2("VP8L", Array(0x2f.toByte, 0, 0, 0, 0))
    assert(onePix.length == 25)
    val r1 = Multimodal.decodeWebp(onePix).get
    assert((r1.getString(0), r1.getInt(1), r1.getInt(2)) == ("webp", 1, 1))
  }

  test("webp_dims: columnar twin agrees with decodeWebp byte-for-byte " +
    "and stays inside codegen") {
    import spark.implicits._
    Graft.install(spark)
    def riff(tag: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val sz = 4 + 8 + payload.length
      out.write(sz & 0xff); out.write((sz >> 8) & 0xff)
      out.write((sz >> 16) & 0xff); out.write((sz >> 24) & 0xff)
      out.write("WEBP".getBytes("US-ASCII"))
      out.write(tag.getBytes("US-ASCII"))
      out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
      out.write((payload.length >> 16) & 0xff)
      out.write((payload.length >> 24) & 0xff)
      out.write(payload)
      out.toByteArray
    }
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0,
      (639 & 0xff).toByte, ((639 >> 8) & 0xff).toByte, 0,
      (479 & 0xff).toByte, ((479 >> 8) & 0xff).toByte, 0))
    val p = 99L | (49L << 14)
    val vp8l = riff("VP8L", Array(0x2f.toByte, (p & 0xff).toByte,
      ((p >> 8) & 0xff).toByte, ((p >> 16) & 0xff).toByte,
      ((p >> 24) & 0xff).toByte, 0, 0, 0, 0, 0))
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, ((320 >> 8) & 0xff).toByte,
      (240 & 0xff).toByte, ((240 >> 8) & 0xff).toByte, 0, 0, 0, 0))
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> vp8x, 2L -> vp8l, 3L -> vp8,
      4L -> "thirty-two bytes of not-a-webp!!".getBytes("UTF-8"))
    val out = rows.toDF("id", "content").repartition(2)
      .select(col("id"), Graft.webpDims(col("content")).as("v"))
    val got = out.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getStruct(1).toSeq))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Seq("VP8X", 640, 480)),
      (2L, Seq("VP8L", 100, 50)),
      (3L, Seq("VP8", 320, 240)),
      (4L, null)), s"got $got")
    // the row decoder sees the SAME dimensions (one shared parser)
    for ((bytes, wh) <- Seq(vp8x -> (640, 480), vp8l -> (100, 50),
        vp8 -> (320, 240))) {
      val r = Multimodal.decodeWebp(bytes).get
      assert((r.getInt(1), r.getInt(2)) == wh)
    }
    // rejected inputs stay rejected in BOTH surfaces: a truncated
    // declared chunk size must not yield dims read from padding
    val truncated = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01,
      0x2a, 0x40, 0x01, 0xf0.toByte, 0, 0, 0, 0, 0))
    truncated(16) = 4
    assert(Multimodal.decodeWebp(truncated).isEmpty &&
      graft.functions.ImageWire.webpRow(truncated) == null)
    // a RIFF that is not WEBP (plain WAV) is rejected by the expression
    assert(graft.functions.ImageWire.webpRow(
      "RIFF    WAVEfmt ................".getBytes("ISO-8859-1")) == null)
    // the expression lives inside a whole-stage-codegen span
    val dist = out.filter(col("v").isNotNull)
    assert(dist.collect().length == 3)
    val plan = dist.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined &&
      plan.contains("webp_dims"),
      s"expected webp_dims inside a codegen stage:\n$plan")
  }

  test("mp3: two-frame verification kills sync-only false positives") {
    // 128 kbps MPEG1 Layer III 44100: frame length 417 bytes. A buffer
    // long enough to HOLD the second header must have one there...
    val hdr = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00)
    val good = hdr ++ Array.fill[Byte](413)(0x55) ++ hdr ++
      Array.fill[Byte](4)(0)
    assert(Multimodal.decodeMp3(good).isDefined)
    // ...and random bytes at the computed offset reject the payload
    val bad = hdr ++ Array.fill[Byte](413)(0x55) ++
      Array[Byte](0x12, 0x34, 0x56, 0x78) ++ Array.fill[Byte](4)(0)
    assert(Multimodal.decodeMp3(bad).isEmpty)
    // ID3v2 with the footer flag (bit 4): tag body + 10 footer bytes;
    // the payload must back one COMPLETE 417-byte frame — decodeMp3
    // rejects bare-header prefixes as probable sync collisions
    val id3f = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 12) ++
      Array.fill[Byte](12)(0) ++ Array.fill[Byte](10)(0x33) ++
      hdr ++ Array.fill[Byte](413)(0x55)
    val rf = Multimodal.decodeMp3(id3f)
    assert(rf.isDefined && rf.get.getString(0) == "mp3")
    // a valid sync whose buffer can't hold its own frame is rejected
    // (the ADVICE-flagged 1-in-8k random-short-binary false positive)
    assert(Multimodal.decodeMp3(hdr ++ Array.fill[Byte](20)(0x55)).isEmpty)
  }

  test("mp3: real frame-header decode, with and without ID3v2") {
    import spark.implicits._
    // MPEG1 Layer III, 44100 Hz, stereo: FF FB 90 00 + one full
    // 417-byte frame of payload (header-only prefixes are rejected)
    val bare = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Array.fill[Byte](413)(0x55)
    // same frame behind a 32-byte ID3v2 tag (syncsafe size = 22)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 22) ++
      Array.fill[Byte](22)(0) ++ bare
    // MPEG2 Layer III 16000 Hz mono: FF F3 88 C0 (rateIdx 2, mode 3)
    val mono16k = Array[Byte](0xff.toByte, 0xf3.toByte, 0x88.toByte,
      0xc0.toByte) ++ Array.fill[Byte](284)(0x55) // 288-byte frame
    val out = Multimodal.withAudioMeta(
        Seq((1L, bare), (2L, id3), (3L, mono16k)).toDF("id", "content"),
        "content")
      .select(col("id"), col("audio_meta.format"), col("audio_meta.channels"),
        col("audio_meta.sample_rate"), col("audio_meta.bits_per_sample"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getFloat(3), r.isNullAt(4))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "mp3", 2, 44100f, true),
      (2L, "mp3", 2, 44100f, true), (3L, "mp3", 1, 16000f, true)),
      s"got ${out.toSeq}")
    // Layer II (not mp3) and garbage fall through to the stub
    val layer2 = Array[Byte](0xff.toByte, 0xfd.toByte, 0x90.toByte, 0) ++
      Array.fill[Byte](20)(0)
    assert(Multimodal.decodeMp3(layer2).isEmpty)
    assert(Multimodal.decodeMp3(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("flac: STREAMINFO states rate/channels/bits/samples exactly") {
    import spark.implicits._
    // 44100 Hz stereo 16-bit, 220500 samples (5.0 s exactly)
    def flac(rate: Int, channels: Int, bits: Int, samples: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(0x80); out.write(0); out.write(0); out.write(34) // last, type 0, len 34
      out.write(Array.fill[Byte](10)(0)) // min/max block+frame sizes
      // rate(20) ch-1(3) bits-1(5) samples(36) packed big-endian
      val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
        ((bits - 1).toLong << 36) | samples
      (7 to 0 by -1).foreach(i => out.write(((packed >> (8 * i)) & 0xff).toInt))
      out.write(Array.fill[Byte](16)(0)) // md5 signature
      out.toByteArray
    }
    val out = Multimodal.withAudioMeta(
        Seq((1L, flac(44100, 2, 16, 220500L)),
          (2L, flac(48000, 1, 24, 0L))).toDF("id", "content"), "content")
      .select(col("id"), col("audio_meta.format"), col("audio_meta.channels"),
        col("audio_meta.sample_rate"), col("audio_meta.bits_per_sample"),
        col("audio_meta.n_frames"), col("audio_meta.duration_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getFloat(3),
        r.getInt(4), if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1.0 else r.getDouble(6)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "flac", 2, 44100f, 16, 220500L, 5.0),
      // totalSamples 0 legally means unknown: frames/duration NULL
      (2L, "flac", 1, 48000f, 24, -1L, -1.0)), s"got ${out.toSeq}")
    // wrong magic / non-STREAMINFO first block fall through
    assert(Multimodal.decodeFlac("fLaX".getBytes ++
      Array.fill[Byte](40)(0)).isEmpty)
    val wrongBlock = "fLaC".getBytes ++ Array[Byte](4, 0, 0, 34) ++
      Array.fill[Byte](40)(0)
    assert(Multimodal.decodeFlac(wrongBlock).isEmpty)
  }

  test("flac_streaminfo / mp3_header: columnar twins agree with the " +
    "row decoders byte-for-byte and stay inside codegen") {
    import spark.implicits._
    Graft.install(spark)
    def flac(rate: Int, channels: Int, bits: Int, samples: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      out.write(Array.fill[Byte](10)(0))
      val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
        ((bits - 1).toLong << 36) | samples
      (7 to 0 by -1).foreach(i => out.write(((packed >> (8 * i)) & 0xff).toInt))
      out.write(Array.fill[Byte](16)(0))
      out.toByteArray
    }
    // one complete 417-byte MPEG1 Layer III frame (FF FB 90 00)
    val mp3 = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00) ++
      Array.fill[Byte](413)(0x55)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> flac(44100, 2, 16, 220500L),
      2L -> flac(48000, 1, 24, 0L), // unknown samples -> NULL fields
      3L -> mp3,
      4L -> "not audio at all, silently NULL".getBytes("UTF-8"))
    val out = rows.toDF("id", "content").repartition(2)
      .select(col("id"),
        Graft.flacStreaminfo(col("content")).as("f"),
        Graft.mp3Header(col("content")).as("m"))
    val got = out.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getStruct(1).toSeq,
        if (r.isNullAt(2)) null else r.getStruct(2).toSeq))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Seq(2, 44100, 16, 220500L, 5000000L), null),
      (2L, Seq(1, 48000, 24, null, null), null),
      (3L, null, Seq(2, 44100)),
      (4L, null, null)), s"got $got")
    // the row decoders see the SAME values (one shared parser)
    val f1 = Multimodal.decodeFlac(rows.head._2).get
    assert(f1.getInt(1) == 2 && f1.getFloat(2) == 44100f &&
      f1.getInt(3) == 16 && f1.getLong(4) == 220500L)
    val m3 = Multimodal.decodeMp3(mp3).get
    assert(m3.getInt(1) == 2 && m3.getFloat(2) == 44100f)
    // rejected-by-rule inputs stay rejected in BOTH surfaces: a bare
    // header the buffer can't back (the r6-ADVICE sync-collision rule)
    val bare = mp3.take(4) ++ Array.fill[Byte](20)(0x55)
    assert(Multimodal.decodeMp3(bare).isEmpty &&
      graft.functions.AudioWire.mp3Row(bare) == null)
    // both expressions live inside a whole-stage-codegen span
    val dist = out.filter(col("f").isNotNull || col("m").isNotNull)
    assert(dist.collect().length == 3)
    val plan = dist.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined &&
      plan.contains("flac_streaminfo") && plan.contains("mp3_header"),
      s"expected both expressions inside a codegen stage:\n$plan")
  }

  test("exif_orientation: hand-assembled APP1 in both byte orders") {
    import spark.implicits._
    Graft.install(spark)
    // a real encoder JPEG (no EXIF) and a PNG must both yield NULL
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> exifJpeg(6, littleEndian = true),   // 90° CW, II
      2L -> exifJpeg(3, littleEndian = false),  // 180°, MM
      3L -> enc("jpg"),                          // JPEG without EXIF
      4L -> enc("png"),                          // not a JPEG
      5L -> Array[Byte](0x12, 0x34, 0x56),       // garbage
      6L -> exifJpeg(6, littleEndian = true).take(9)) // truncated APP1
    val out = Multimodal.withExifOrientation(
        rows.toDF("id", "content"), "content")
      .select(col("id"), col("exif_orientation"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .sortBy(_._1)
    assert(out.toSeq == Seq(1L -> Some(6), 2L -> Some(3), 3L -> None,
      4L -> None, 5L -> None, 6L -> None))
    // spec-legal 0xFF fill bytes before a marker (T.81 B.1.1.2) must
    // not derail the walk
    val fj = exifJpeg(6, littleEndian = true)
    val filled = fj.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ fj.drop(2)
    assert(graft.functions.Exif.orientation(filled) == 6)
    // type 4 (LONG) writers are real in the wild (ADVICE r6): the
    // 32-bit value field is read whole, in either byte order
    assert(graft.functions.Exif.orientation(
      exifJpeg(8, littleEndian = true, tiffType = 4)) == 8)
    assert(graft.functions.Exif.orientation(
      exifJpeg(2, littleEndian = false, tiffType = 4)) == 2)
    // out-of-range LONG and unknown types still yield NULL
    assert(graft.functions.Exif.orientation(
      exifJpeg(9, littleEndian = true, tiffType = 4)) == null)
    assert(graft.functions.Exif.orientation(
      exifJpeg(6, littleEndian = true, tiffType = 2)) == null)
    // the expression stays inside whole-stage codegen (no fallback);
    // repartition first — on a bare local relation the optimizer
    // constant-folds the whole projection away (ConvertToLocalRelation)
    val dist = Multimodal.withExifOrientation(
        rows.toDF("id", "content").repartition(2), "content")
      .filter(col("exif_orientation").isNotNull)
    // collect THIS df (count() would execute a different plan): AQE
    // finalizes (and codegen-compiles) the plan only on execution;
    // '*(n)' prefixes mark WholeStageCodegen spans in the plan string
    assert(dist.collect().length == 2, "codegen path agrees with folded")
    val plan = dist.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined &&
      plan.contains("exif_orientation"),
      s"expected the expression inside a codegen stage:\n$plan")
  }

  test("png_dims/jpeg_dims: native walks agree with ImageIO on real " +
       "encoder output, twin the row decoders, and stay in codegen") {
    import spark.implicits._
    Graft.install(spark)
    assume(
      try { Class.forName("javax.imageio.ImageIO"); true }
      catch { case _: Throwable => false },
      "ImageIO present in this runtime")
    // REAL encoder output, not hand-built headers: whatever chunk/
    // segment layout the JDK encoders emit, the walks must find the
    // dims ImageIO reports
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, x * 31 + y * 17)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = encode("png", 321, 47)
    val jpg = encode("jpg", 123, 77)
    for ((bytes, fmt, w, h) <- Seq((png, "png", 321, 47),
        (jpg, "jpeg", 123, 77))) {
      // the native walk, the row decoder, and ImageIO all agree
      val io = Multimodal.decodeImage(bytes).get
      assert((io.getString(0), io.getInt(1), io.getInt(2)) == (fmt, w, h))
      val row = (if (fmt == "png") Multimodal.decodePng(bytes)
                 else Multimodal.decodeJpeg(bytes)).get
      assert((row.getString(0), row.getInt(1), row.getInt(2)) ==
        (fmt, w, h))
    }
    // JDK PNGs are 8-bit truecolor (color type 2); JDK JPEGs are
    // 8-bit precision 3-component baseline
    val pm = graft.functions.ImageWire.pngFields(png)
    assert((pm.bitDepth, pm.colorType) == ((8, 2)), s"got $pm")
    val jm = graft.functions.ImageWire.jpegFields(jpg)
    assert((jm.precision, jm.nComponents) == ((8, 3)), s"got $jm")
    // columnar twins over a distributed frame
    val rows: Seq[(Long, Array[Byte])] = Seq(1L -> png, 2L -> jpg,
      3L -> "thirty-two bytes of not-an-image".getBytes("UTF-8"))
    val out = rows.toDF("id", "content").repartition(2)
      .select(col("id"),
        Graft.pngDims(col("content")).as("p"),
        Graft.jpegDims(col("content")).as("j"))
    val got = out.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getStruct(1).toSeq,
        if (r.isNullAt(2)) null else r.getStruct(2).toSeq))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Seq(321, 47, 8, 2), null),
      (2L, null, Seq(123, 77, 8, 3)),
      (3L, null, null)), s"got $got")
    // rejected stays rejected in BOTH surfaces: truncating the payload
    // below the walks' minimum reads must not yield dims from padding
    assert(Multimodal.decodePng(png.take(25)).isEmpty &&
      graft.functions.ImageWire.pngRow(png.take(25)) == null)
    // JPEG whose SOF is cut off mid-segment: keep SOI + the first
    // segments but stop before any SOF completes
    assert(Multimodal.decodeJpeg(jpg.take(6)).isEmpty &&
      graft.functions.ImageWire.jpegRow(jpg.take(6)) == null)
    // a declared IHDR length too short for its fields is rejected
    val shortIhdr = png.clone(); shortIhdr(11) = 5
    assert(graft.functions.ImageWire.pngFields(shortIhdr) == null)
    // withMediaMeta still reports the same four fields it always did
    // (the native walks replaced the ImageIO path, not its answer)
    val meta = Multimodal.withMediaMeta(
        rows.toDF("id", "content"), "content")
      .select(col("id"), col("media_meta.format"),
        col("media_meta.width"), col("media_meta.height"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getInt(3))).sortBy(_._1).toSeq
    assert(meta.take(2) == Seq((1L, "png", 321, 47),
      (2L, "jpeg", 123, 77)), s"got $meta")
    // both expressions live inside a whole-stage-codegen span
    val dist = out.filter(col("p").isNotNull || col("j").isNotNull)
    assert(dist.collect().length == 2)
    val plan2 = dist.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan2).isDefined &&
      plan2.contains("png_dims") && plan2.contains("jpeg_dims"),
      s"expected png_dims/jpeg_dims inside a codegen stage:\n$plan2")
  }
}
