package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, ""),                  // empty payload → no frames
    (1L, "a" * 10),            // single partial frame
    (2L, "b" * 300),           // several frames, partial tail
    (3L, "c" * 5000),          // hits the maxFrames cap
  ).toDF("doc_id", "text")

  private lazy val withPayload =
    Multimodal.withTextPayload(docs, "text", "payload")

  test("sampleFrames: decimation, cap, partial tail, empty payload") {
    val rows = Multimodal.sampleFrames(withPayload, "doc_id", "payload",
      frameLen = 64, everyNth = 2, maxFrames = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(!rows.exists(_._1 == 0L), "empty payload emits no frames")
    assert(rows.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 10L)), "one partial frame")
    // 300 bytes → frames 0..4, sampled 0,2,4; tail frame 4 holds 300-256=44 bytes
    assert(rows.filter(_._1 == 2L).map(t => (t._2, t._4)).toSeq ==
      Seq((0L, 64L), (2L, 64L), (4L, 44L)))
    // 5000 bytes → 79 frames, sampled 0,2,4,... capped at 5
    assert(rows.count(_._1 == 3L) == 5)
    assert(rows.filter(_._1 == 3L).map(_._2).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
  }

  test("resizePlan: aspect-preserving integer fit, never upscales") {
    val rows = Multimodal.resizePlan(withPayload, "doc_id", "payload",
      maxW = 320, maxH = 240)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (_, sw, sh, dw, dh) =>
      assert(dw <= 320 && dh <= 240, "fits the bounding box")
      assert(dw <= sw && dh <= sh, "never upscales")
      // aspect preserved within integer-floor tolerance
      assert(math.abs(dw.toDouble / dh - sw.toDouble / sh) <
        1.0 / math.min(dh, sh) * 2 + 0.02)
    }
  }

  test("blobShardManifest: first-fit shards, contiguous offsets, blobs never split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // blobs of 40/30/40/50/10 bytes into 100-byte shards: prefixes
    // 0/40/70/110/160 -> shards 0/0/0/1/1
    val df = Seq(
      (1L, "a" * 40), (2L, "b" * 30), (3L, "c" * 40), (4L, "d" * 50), (5L, "e" * 10)
    ).toDF("doc_id", "text")
    val m = Multimodal.blobShardManifest(
      Multimodal.withTextPayload(df, "text", "payload"), "doc_id", "payload", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      (1L, 40L, 0L, 0L), (2L, 30L, 0L, 40L), (3L, 40L, 0L, 70L),
      (4L, 50L, 1L, 0L), (5L, 10L, 1L, 50L)))
    // invariants on the corpus table: offsets contiguous per shard,
    // shard ids dense-monotone in id order, sizes preserved
    val docs = graft.tables.TestTables.documents(spark, sfDir)
    val corpus = Multimodal.blobShardManifest(
      Multimodal.withTextPayload(docs, "text", "payload"), "doc_id", "payload", 4096L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    corpus.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.foldLeft(0L) { case (expectedOff, (_, n, _, off)) =>
        assert(off == expectedOff, "contiguous within shard")
        expectedOff + n
      }
    }
    assert(corpus.map(_._3).toSeq == corpus.map(_._3).toSeq.sorted, "shards monotone in id order")
  }

  test("Png: encode→decode round-trips dimensions; malformed input rejected") {
    // local round-trip across all color types and edge dimensions
    for ((w, h, ct, ch) <- Seq((1, 1, 0, 1L), (640, 480, 2, 3L),
        (13, 479, 6, 4L), (639, 1, 2, 3L))) {
      assert(Multimodal.Png.decode(Multimodal.Png.encode(w, h, ct)) ==
        ((w.toLong, h.toLong, ch)), s"($w,$h,$ct)")
    }
    // a real PNG is parseable by the JDK's own reader — proves the
    // writer emits the actual format, not a private encoding
    val img = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(Multimodal.Png.encode(37, 21, 2)))
    val readers = javax.imageio.ImageIO.getImageReaders(img)
    assert(readers.hasNext, "JDK recognises the stream as an image")
    val reader = readers.next()
    reader.setInput(img)
    assert(reader.getWidth(0) == 37 && reader.getHeight(0) == 21)
    // corruption surfaces as an error, not as zeros
    val good = Multimodal.Png.encode(10, 10, 2)
    val badSig = good.clone(); badSig(0) = 0x00
    intercept[IllegalArgumentException](Multimodal.Png.decode(badSig))
    val badCrc = good.clone(); badCrc(16) = (badCrc(16) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.Png.decode(badCrc))
  }

  test("Png.encodePixels/decodePixels: bit-exact round trip, ImageIO ground truth, corruption rejected") {
    def f(seed: Long)(x: Int, y: Int, c: Int): Int =
      ((seed + 3L * x + 7L * y + 11L * c) % 256).toInt
    // ≥5 rows ⇒ every filter type (None/Sub/Up/Average/Paeth) on the
    // wire; all three color types; 1×1 edge
    for ((w, h, ct, ch) <- Seq((1, 1, 0, 1), (17, 9, 0, 1), (13, 11, 2, 3),
        (8, 23, 6, 4), (31, 5, 2, 3))) {
      val png = Multimodal.Png.encodePixels(w, h, ct, f(w * 1000L + h))
      val (dw, dh, dch, px) = Multimodal.Png.decodePixels(png)
      assert((dw, dh, dch) == ((w, h, ch)), s"($w,$h,$ct)")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert((px(y * w * ch + x * ch + c) & 0xFF) == f(w * 1000L + h)(x, y, c),
          s"($w,$h,$ct) pixel ($x,$y,$c)")
      // the JDK's OWN decoder reads the same samples back — proves
      // the writer emits standard PNG (filters, zlib framing and all),
      // and cross-validates our unfilter against an independent codec
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(raster.getSample(x, y, c) == f(w * 1000L + h)(x, y, c),
          s"ImageIO ($w,$h,$ct) sample ($x,$y,$c)")
    }
    // corrupting one byte of compressed pixel data fails the CRC
    val good = Multimodal.Png.encodePixels(10, 10, 2, f(1))
    val bad = good.clone(); bad(45) = (bad(45) ^ 0x20).toByte
    intercept[IllegalArgumentException](Multimodal.Png.decodePixels(bad))
    // declaring MORE rows than the pixel data holds must surface
    val short = Multimodal.Png.encodePixels(4, 3, 0, f(2))
    val grown = {
      // rewrite IHDR height 3→200, fix the CRC, keep the tiny IDAT
      val b = short.clone()
      val bb = java.nio.ByteBuffer.wrap(b)
      bb.putInt(20, 200)
      val crc = new java.util.zip.CRC32(); crc.update(b, 12, 17)
      bb.putInt(29, crc.getValue.toInt); b
    }
    intercept[IllegalArgumentException](Multimodal.Png.decodePixels(grown))
  }

  test("PNG pixel pipeline: distributed decode reproduces the closed-form sample sums") {
    val d = spark.range(0, 60).toDF("doc_id")
    val out = Multimodal.decodePngPixels(
      Multimodal.withPngPixelPayload(d, "doc_id", "png"), "doc_id", "png")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 60)
    out.foreach { case (id, w, h, ch, n, sum) =>
      assert(w == id % 16 + 1 && h == id * 7 % 16 + 1, s"id=$id")
      assert(n == w * h * ch, s"id=$id")
      val expected = (for {
        y <- 0L until h; x <- 0L until w; c <- 0L until ch
      } yield (id + 3 * x + 7 * y + 11 * c) % 256).sum
      assert(sum == expected, s"id=$id pixel_sum")
    }
  }

  test("Png.decodePixels: foreign (ImageIO-encoded) PNGs decode bit-exactly; 16-bit/palette/interlace rejected loudly") {
    // the inverse direction of the ImageIO cross-check above: bytes OUR
    // writer never produced (JDK encoder picks its own filters/zlib
    // strategy), read by OUR decoder
    def f(x: Int, y: Int, c: Int): Int = (5 + 3 * x + 7 * y + 11 * c) % 256
    val (w, h) = (19, 13)
    def imageioPng(imgType: Int, ch: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        img.getRaster.setSample(x, y, c, f(x, y, c))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    for ((imgType, ch) <- Seq(
        (java.awt.image.BufferedImage.TYPE_3BYTE_BGR, 3),
        (java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 1))) {
      val (dw, dh, dch, px) = Multimodal.Png.decodePixels(imageioPng(imgType, ch))
      assert((dw, dh, dch) == ((w, h, ch)), s"type=$imgType")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert((px((y * w + x) * ch + c) & 0xFF) == f(x, y, c),
          s"type=$imgType sample ($x,$y,$c)")
    }
    // REAL foreign 16-bit and palette streams (ImageIO writes
    // TYPE_USHORT_GRAY as bit-depth 16 and TYPE_BYTE_INDEXED as
    // colorType 3): out of the codec's declared scope — must reject
    // loudly, never decode garbage
    val e16 = intercept[IllegalArgumentException](Multimodal.Png.decodePixels(
      imageioPng(java.awt.image.BufferedImage.TYPE_USHORT_GRAY, 1)))
    assert(e16.getMessage.contains("8-bit"), e16.getMessage)
    val ePal = intercept[IllegalArgumentException](Multimodal.Png.decodePixels(
      imageioPng(java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, 1)))
    assert(ePal.getMessage.contains("color type"), ePal.getMessage)
    // Adam7 interlace: no JDK encoder writes it, so patch the IHDR
    // interlace byte (offset 28) on our own stream and re-CRC
    def patchIhdr(png: Array[Byte], off: Int, v: Byte): Array[Byte] = {
      val b = png.clone(); b(off) = v
      val crc = new java.util.zip.CRC32(); crc.update(b, 12, 17)
      java.nio.ByteBuffer.wrap(b).putInt(29, crc.getValue.toInt); b
    }
    val own = Multimodal.Png.encodePixels(6, 6, 2, f)
    val eIl = intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 28, 1)))
    assert(eIl.getMessage.contains("interlace"), eIl.getMessage)
    // and the same loud-rejection contract via raw IHDR patches
    assert(intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 24, 16))).getMessage.contains("8-bit"))
    assert(intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 25, 3))).getMessage.contains("color type"))
  }

  test("Wav: encode→decode bit-exact; RIFF chunk walk; AudioSystem ground truth; malformed rejected") {
    def f(seed: Int)(fr: Int, c: Int): Int = (seed + 13 * fr + 17 * c) % 65536 - 32768
    for ((rate, ch, bits, n) <- Seq((8000, 1, 16, 7), (44100, 2, 16, 32),
        (16000, 1, 8, 5), (22050, 2, 8, 0))) {
      val g: (Int, Int) => Int =
        if (bits == 16) f(rate) else (fr, c) => (fr * 31 + c * 7) % 256
      val wav = Multimodal.Wav.encodePcm(rate, ch, bits, n, g)
      val (dr, dch, db, samples) = Multimodal.Wav.decode(wav)
      assert((dr, dch, db) == ((rate, ch, bits)))
      assert(samples.length == n * ch)
      for (fr <- 0 until n; c <- 0 until ch) {
        val expect = if (bits == 16) g(fr, c) else g(fr, c) - 128
        assert(samples(fr * ch + c) == expect, s"($rate,$ch,$bits) sample ($fr,$c)")
      }
    }
    // the JDK's OWN audio reader parses the stream — format fields and
    // raw PCM bytes agree, so the writer emits standard WAV framing
    val wav = Multimodal.Wav.encodePcm(8000, 2, 16, 11, f(3))
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 2 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    assert(java.util.Arrays.equals(ais.readAllBytes(), wav.takeRight(11 * 2 * 2)))
    // chunk walk: an unknown odd-length LIST chunk between fmt and data
    // must be skipped by declared size WITH the RIFF word-alignment pad
    def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    val withList = {
      val extra = "LIST".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // len 3 + pad
      val b = wav.take(36) ++ extra ++ wav.drop(36)
      putLe32(b, 4, wav.length - 8 + extra.length); b
    }
    val (lr, lch, lb, lSamples) = Multimodal.Wav.decode(withList)
    assert((lr, lch, lb) == ((8000, 2, 16)) &&
      lSamples.toSeq == Multimodal.Wav.decode(wav)._4.toSeq)
    // corruption surfaces as an error, never as silence
    val badSig = wav.clone(); badSig(0) = 0x00
    intercept[IllegalArgumentException](Multimodal.Wav.decode(badSig))
    val float32 = wav.clone(); float32(20) = 3 // wFormatTag = IEEE float
    assert(intercept[IllegalArgumentException](
      Multimodal.Wav.decode(float32)).getMessage.contains("PCM"))
    val depth24 = wav.clone(); depth24(34) = 24
    assert(intercept[IllegalArgumentException](
      Multimodal.Wav.decode(depth24)).getMessage.contains("bit depth"))
    intercept[IllegalArgumentException](Multimodal.Wav.decode(wav.dropRight(1)))
  }

  test("WAV pipeline: distributed decode reproduces the closed-form sample sums") {
    val d = spark.range(0, 60).toDF("doc_id")
    val out = Multimodal.decodeWavSamples(
      Multimodal.withWavPayload(d, "doc_id", "wav"), "doc_id", "wav")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 60)
    out.foreach { case (id, rate, ch, bits, n, sum) =>
      assert(rate == 8000 + (id % 4) * 4000 && ch == id % 2 + 1 &&
        bits == 16 && n == id % 32 + 1, s"id=$id")
      val expected = (for {
        fr <- 0L until n; c <- 0L until ch
      } yield (id + 13 * fr + 17 * c) % 65536 - 32768).sum
      assert(sum == expected, s"id=$id sample_sum")
    }
  }

  test("PNG pipeline: payload built and decoded distributed, fields match the id arithmetic") {
    val d = spark.range(0, 50).toDF("doc_id")
    val out = Multimodal.decodePngMeta(
      Multimodal.withPngPayload(d, "doc_id", "png"), "doc_id", "png")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 50)
    out.foreach { case (id, w, h, c) =>
      assert(w == id % 640 + 1 && h == id * 7 % 480 + 1, s"id=$id")
      assert(c == (id % 3 match { case 0 => 1L; case 1 => 3L; case _ => 4L }), s"id=$id")
    }
  }
}
