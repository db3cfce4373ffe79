package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing (north-star spec): schema, batch
  * shape, and explode/featurize shapes are real; kernels are stubs. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.withFakeMedia(Tables.documents(spark, sf0001)).cache()

  test("withFakeMedia attaches binary payload + typed metadata") {
    val bad = media.filter(col("media").isNull ||
      col("media_meta.content_length") =!= col("n_chars")).count()
    assert(bad == 0, "payload must be non-null with exact content_length")
    val kinds = media.select("media_meta.kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeImageStub yields bounded dimensions inside codegen") {
    val decoded = media.withColumn("img", Multimodal.decodeImageStub(col("media")))
    val bad = decoded.filter(col("img.width") < 1 || col("img.width") > 1920 ||
      col("img.height") < 1 || col("img.height") > 1080 ||
      col("img.channels") =!= 3).count()
    assert(bad == 0)
  }

  test("decodePartitions preserves rows and computes per-row features") {
    val out = Multimodal.decodePartitions(media, "media")
    assert(out.count() == media.count())
    val bad = out.filter(col("n_bytes") =!= col("media_meta.content_length") ||
      col("feature_sum") <= 0).count()
    assert(bad == 0)
  }

  test("decodeImages reads real PNG dimensions via javax.imageio, nulls for junk") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800) // non-trivial pixel so the file isn't degenerate
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = Seq(
      (1L, png(17, 9)),
      (2L, png(3, 31)),
      (3L, "definitely not an image".getBytes("UTF-8"))).toDF("id", "media")
    val out = Multimodal.decodeImages(df, "media")
      .select("id", "img_width", "img_height", "img_bands")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == ((Some(17), Some(9), Some(3))))
    assert(out(2L) == ((Some(3), Some(31), Some(3))))
    assert(out(3L) == ((None, None, None)), "junk bytes must decode to nulls, not fail")
  }

  test("resizeImages re-encodes to the target dimensions; imageRgbStats is exact") {
    import spark.implicits._
    // a solid-color 10x4 PNG: resize must not change the color means
    val img = new java.awt.image.BufferedImage(10, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(200, 100, 50)); g.fillRect(0, 0, 10, 4)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray),
      (2L, "junk".getBytes("UTF-8"))).toDF("id", "media")

    val resized = Multimodal.resizeImages(df, "media", 4, 4)
    val back = Multimodal.decodeImages(
      resized.filter(col("id") === 1).select(col("resized").as("media")), "media")
      .select("img_width", "img_height").head()
    assert((back.getInt(0), back.getInt(1)) == ((4, 4)))
    assert(resized.filter(col("id") === 2).head().isNullAt(2),
      "junk payload must resize to null, not fail")

    val stats = Multimodal.imageRgbStats(df.filter(col("id") === 1), "media")
      .select("rgb_mean").head().getSeq[Double](0)
    assert(stats == Seq(200.0, 100.0, 50.0),
      s"solid color must produce exact channel means, got $stats")
  }

  test("decodeAudio reads real WAV metadata and RMS via javax.sound, nulls for junk") {
    import spark.implicits._
    // 0.5 s of a 440 Hz sine at amplitude 0.5, 16-bit mono PCM 8 kHz:
    // RMS must come back ≈ 0.5/√2
    val rate = 8000
    val n = rate / 2
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)

    val df = Seq((1L, bos.toByteArray),
      (2L, "definitely not audio".getBytes("UTF-8"))).toDF("id", "media")
    val out = Multimodal.decodeAudio(df, "media").collect()
      .map(r => r.getLong(0) -> r).toMap

    val ok = out(1L)
    assert(ok.getInt(2) == rate && ok.getInt(3) == 1,
      s"expected 8 kHz mono, got ${ok.getInt(2)} Hz x${ok.getInt(3)}")
    assert(ok.getLong(4) == n.toLong, "frame count must match the written PCM")
    assert(math.abs(ok.getDouble(5) - 0.5) < 1e-6, "duration must be 0.5 s")
    assert(math.abs(ok.getDouble(6) - amp / math.sqrt(2)) < 0.01,
      s"sine RMS must be amp/sqrt(2), got ${ok.getDouble(6)}")
    val junk = out(2L)
    assert(junk.isNullAt(2) && junk.isNullAt(6),
      "junk bytes must decode to nulls, not fail the task")
  }

  /** One solid-gray JPEG frame at the given level, built in-test. */
  private def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal MJPEG-AVI container around the given frames: RIFF("AVI ")
    * with an empty hdrl LIST (headers irrelevant to the demux contract)
    * and a movi LIST of 00dc chunks, each padded to even length. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII")); b.write(u32le(data.length))
      b.write(data)
      if ((data.length & 1) == 1) b.write(0) // even padding
      b.toByteArray
    }
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++
      chunk("avih", Array.fill[Byte](56)(0)))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(u32le(payload.length))
    bos.write(payload)
    bos.toByteArray
  }

  test("sampleVideoFrames demuxes real MJPEG streams and AVI containers") {
    import spark.implicits._
    // three gray levels: luma must come out ordered and ≈ the fill level
    // (JPEG is lossy — solid frames survive within a few levels)
    val levels = Seq(40, 128, 220)
    val frames = levels.map(l => jpegFrame(16, 8, l))
    val mjpeg = frames.reduce(_ ++ _)
    val avi = mjpegAvi(frames)
    val df = Seq(
      (1L, mjpeg), (2L, avi), (3L, "not a video at all".getBytes("UTF-8")))
      .toDF("vid", "payload")
    val out = Multimodal.sampleVideoFrames(df, "payload")
      .select("vid", "n_frames", "frame_no", "frame_w", "frame_h", "frame_luma")
      .collect().groupBy(_.getLong(0))
    for (vid <- Seq(1L, 2L)) {
      val rows = out(vid).sortBy(_.getInt(2))
      assert(rows.length == 3, s"vid=$vid must demux 3 frames")
      rows.zip(levels).foreach { case (r, lvl) =>
        assert(r.getInt(1) == 3, "n_frames")
        assert(r.getInt(3) == 16 && r.getInt(4) == 8, "decoded dimensions")
        assert(math.abs(r.getDouble(5) - lvl) < 8.0,
          s"vid=$vid frame ${r.getInt(2)}: luma ${r.getDouble(5)} vs fill $lvl")
      }
      // strictly increasing luma across the three frames
      assert(rows.map(_.getDouble(5)).sliding(2).forall(p => p(0) < p(1)))
    }
    val junk = out(3L)
    assert(junk.length == 1 && junk(0).getInt(1) == 0 && junk(0).isNullAt(3),
      "non-video payload yields one n_frames=0 row with null frame fields")
  }

  test("sampleVideoFrames stride samples every k-th frame") {
    import spark.implicits._
    val frames = (0 until 7).map(i => jpegFrame(8, 8, 30 + 20 * i))
    val df = Seq((1L, frames.reduce(_ ++ _))).toDF("vid", "payload")
    val out = Multimodal.sampleVideoFrames(df, "payload", stride = 3)
      .select("n_frames", "frame_no").collect()
    assert(out.map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6))
    assert(out.forall(_.getInt(0) == 7), "n_frames counts ALL demuxed frames")
  }

  test("demuxCensus counts real frames only: padding honored, rec-LIST " +
      "recursed, idx1 decoy skipped (q402's brute reference)") {
    import spark.implicits._
    // handcrafted container, census expected values computed BY HAND —
    // the independent reference behind q402's formula oracle
    def u32le(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII")); b.write(u32le(data.length))
      b.write(data)
      if ((data.length & 1) == 1) b.write(0)
      b.toByteArray
    }
    val fa = Array[Byte](1, 2, 3)               // odd size → 1 pad byte
    val fb = Array[Byte](250.toByte, 0, 5, 1)   // inside LIST('rec ')
    val rec = chunk("LIST", "rec ".getBytes("US-ASCII") ++ chunk("01dc", fb))
    // idx1 interior bytes FAKE a 00dc frame header — a walk that
    // recurses into the plain chunk would count a phantom 8-byte frame
    val decoy = "00dc".getBytes("US-ASCII") ++ u32le(8) ++
      Array.fill[Byte](8)(0xab.toByte)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", fa) ++ rec) ++ chunk("idx1", decoy)
    val payload = "AVI ".getBytes("US-ASCII") ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ u32le(payload.length) ++ payload
    val out = Multimodal.demuxCensus(
      Seq((1L, avi), (2L, null: Array[Byte])).toDF("vid", "media"), "media")
      .select("vid", "n_frames", "payload_bytes", "byte_checksum")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    // frames: [1,2,3] and [250,0,5,1] — 2 frames, 7 bytes, sum 262;
    // the pad byte and the idx1 decoy contribute NOTHING
    assert(out(1L) === ((2, 7L, 262L)))
    assert(out(2L) === ((0, 0L, 0L)), "null payload reports zeros")
  }

  test("demuxCensus MJPEG scan: stuffing honored, restart markers " +
      "skipped, junk resync'd, truncated tail dropped (q406's brute " +
      "reference)") {
    import spark.implicits._
    // handcrafted stream, census expected values computed BY HAND —
    // the independent reference behind q406's formula oracle
    def B(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // frame 1: SOI, data 01 02, stuffed FF 00, restart FFD0, 04, EOI
    val f1 = B(0xFF, 0xD8, 0x01, 0x02, 0xFF, 0x00, 0xFF, 0xD0, 0x04,
      0xFF, 0xD9)
    // inter-frame junk with no SOI: must be skipped while resyncing
    val junk = "XY".getBytes("US-ASCII")
    // frame 2: SOI, 05, restart FFD7 (highest, closest to D9), 06, EOI
    val f2 = B(0xFF, 0xD8, 0x05, 0xFF, 0xD7, 0x06, 0xFF, 0xD9)
    // truncated tail: SOI + data, NO EOI — dropped, not looped on
    val tail = B(0xFF, 0xD8, 0x07, 0x08)
    val stream = f1 ++ junk ++ f2 ++ tail
    val out = Multimodal.demuxCensus(
      Seq((1L, stream)).toDF("vid", "media"), "media")
      .select("n_frames", "payload_bytes", "byte_checksum")
      .collect()(0)
    // by hand: 2 frames; bytes 11 + 8 = 19; checksums
    // f1: 255+216+1+2+255+0+255+208+4+255+217 = 1668
    // f2: 255+216+5+255+215+6+255+217 = 1424  → 3092
    assert(out.getInt(0) === 2, "exactly the two complete frames")
    assert(out.getLong(1) === 19L, "frame bytes include their markers")
    assert(out.getLong(2) === 3092L, "byte checksum")
  }

  test("featurizeStub emits fixed-dim vectors in [0,1)") {
    val out = Multimodal.featurizeStub(media, 16)
    val bad = out.filter(size(col("media_vec")) =!= 16 ||
      exists(col("media_vec"), v => v < 0f || v >= 1f)).count()
    assert(bad == 0)
  }

  test("dHash: re-encode-stable, robust to resize, far for different images") {
    import spark.implicits._
    // deterministic gradient image — structure survives downscaling
    def gradient(w: Int, h: Int, seed: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // seed selects the STRUCTURE (gradient direction + stripes), not
        // just an offset — dHash reads gradients, so different seeds
        // must differ in where brightness increases
        val v = (if (seed % 2 == 1) x * 255 / w + (x * y * seed) % 13
                 else 255 - x * 255 / w + (if ((x / 4) % 2 == 0) 60 else 0) +
                   (y * seed) % 17) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val df = Seq(
      (1L, gradient(64, 48, 1, "png")),
      (2L, gradient(64, 48, 1, "jpg")),    // same pixels, other codec
      (3L, gradient(128, 96, 1, "png")),   // same structure, 2x size
      (4L, gradient(64, 48, 8, "png")),    // different structure (even seed)
      (5L, "junk".getBytes("UTF-8"))).toDF("id", "media")
    val h = Multimodal.dHashImages(df, "media")
      .select("id", "dhash").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(5L).isEmpty, "junk bytes must hash to null")
    assert(ham(h(1L).get, h(2L).get) <= 6, "jpeg re-encode must stay near")
    assert(ham(h(1L).get, h(3L).get) <= 6, "2x resize must stay near")
    assert(ham(h(1L).get, h(4L).get) >= 16,
      s"different images must be far, got ${ham(h(1L).get, h(4L).get)}")
  }

  test("binaryFile source ingests an image directory straight into the decode pipeline") {
    // the ingest path a multimodal lake starts from: files on disk →
    // binaryFile scan (path, modificationTime, length, content) → the
    // same decode kernels that serve parquet-resident payloads. The
    // source supports pathGlobFilter pushdown, so non-image junk never
    // leaves the scan.
    val dir = java.nio.file.Files.createTempDirectory("graft_binsrc").toFile
    try {
      def write(name: String, w: Int, h: Int): Unit = {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x336699)
        javax.imageio.ImageIO.write(img, "png", new java.io.File(dir, name))
      }
      write("a.png", 8, 6)
      write("b.png", 12, 3)
      java.nio.file.Files.write(new java.io.File(dir, "junk.txt").toPath,
        "not an image".getBytes)
      val files = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(dir.getAbsolutePath)
      assert(files.count() == 2, "glob filter must drop the junk file")
      assert(files.columns.toSet ==
        Set("path", "modificationTime", "length", "content"))
      val dims = Multimodal.decodeImages(
          files.select(col("path"), col("content").as("media")), "media")
        .select("img_width", "img_height").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(dims == Set((8, 6), (12, 3)),
        s"decoded dimensions must match what was written: $dims")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }
}
