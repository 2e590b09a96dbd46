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

  test("Png.decodePixels: foreign (ImageIO-encoded) PNGs decode bit-exactly, incl. 16-bit and palette") {
    // the inverse direction of the ImageIO cross-check above: bytes OUR
    // writer never produced (JDK encoder picks its own filters/zlib
    // strategy), read by OUR decoder
    def f(x: Int, y: Int, c: Int): Int = (5 + 3 * x + 7 * y + 11 * c) % 256
    val (w, h) = (19, 13)
    def imageioPng(imgType: Int, ch: Int,
        g: (Int, Int, Int) => Int = f): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        img.getRaster.setSample(x, y, c, g(x, y, c))
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
    // REAL foreign 16-bit stream: ImageIO writes TYPE_USHORT_GRAY as
    // bit-depth 16 — decodeRaster reads every big-endian sample back
    def f16(x: Int, y: Int, c: Int): Int = (5 + 257 * x + 1031 * y) % 65536
    val r16 = Multimodal.Png.decodeRaster(
      imageioPng(java.awt.image.BufferedImage.TYPE_USHORT_GRAY, 1, f16))
    assert((r16.width, r16.height, r16.channels, r16.bitDepth) == ((w, h, 1, 16)))
    for (y <- 0 until h; x <- 0 until w)
      assert(r16.samples(y * w + x) == f16(x, y, 0), s"16-bit sample ($x,$y)")
    // ...and decodePixels refuses to silently truncate it to 8 bits
    val e16 = intercept[IllegalArgumentException](Multimodal.Png.decodePixels(
      imageioPng(java.awt.image.BufferedImage.TYPE_USHORT_GRAY, 1, f16)))
    assert(e16.getMessage.contains("decodeRaster"), e16.getMessage)
    // REAL foreign palette stream (TYPE_BYTE_INDEXED → colorType 3):
    // expanded to 8-bit RGB, compared against the JDK's own expansion
    val palPng = imageioPng(java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, 1)
    val palImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(palPng))
    val rPal = Multimodal.Png.decodeRaster(palPng)
    assert((rPal.width, rPal.height, rPal.channels, rPal.bitDepth) == ((w, h, 3, 8)))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = palImg.getRGB(x, y)
      val i = (y * w + x) * 3
      assert(rPal.samples(i) == ((rgb >> 16) & 0xFF)
        && rPal.samples(i + 1) == ((rgb >> 8) & 0xFF)
        && rPal.samples(i + 2) == (rgb & 0xFF), s"palette pixel ($x,$y)")
    }
    // invalid IHDR fields still surface loudly (patch + re-CRC)
    def patchIhdr(png: Array[Byte], off: Int, v: Byte): Array[Byte] = {
      val b = png.clone(); b(off) = v
      val crc = new java.util.zip.CRC32(); crc.update(b, 12, 17)
      java.nio.ByteBuffer.wrap(b).putInt(29, crc.getValue.toInt); b
    }
    val own = Multimodal.Png.encodePixels(6, 6, 2, f)
    assert(intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 24, 7))).getMessage.contains("bad bit depth"))
    assert(intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 25, 5))).getMessage.contains("bad color type"))
    assert(intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 28, 2))).getMessage.contains("bad interlace"))
    // truecolor at bit depth 4 is not a legal combination
    assert(intercept[IllegalArgumentException](
      Multimodal.Png.decodePixels(patchIhdr(own, 24, 4))).getMessage.contains("bad bit depth"))
  }

  test("Png 16-bit + Adam7: round trips, ImageIO cross-reads our interlaced streams, sub-byte depths unpack") {
    def f16(x: Int, y: Int, c: Int): Int = (9 + 257 * x + 1031 * y + 4099 * c) % 65536
    // 16-bit gray / RGB / RGBA, plain and interlaced; dims below and
    // above the 8×8 Adam7 tile so empty and partial passes both occur
    for ((w, h, ct, ch) <- Seq((1, 1, 0, 1), (5, 3, 0, 1), (17, 9, 2, 3),
        (13, 21, 6, 4), (8, 8, 0, 1));
        il <- Seq(false, true)) {
      val png = Multimodal.Png.encodeRaster(w, h, ct, 16, il, f16)
      val r = Multimodal.Png.decodeRaster(png)
      assert((r.width, r.height, r.channels, r.bitDepth) == ((w, h, ch, 16)),
        s"($w,$h,$ct,il=$il)")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(r.samples((y * w + x) * ch + c) == f16(x, y, c),
          s"($w,$h,$ct,il=$il) sample ($x,$y,$c)")
      // the JDK decoder deinterlaces and widens identically — proves
      // our interlaced writer emits spec PNG, and cross-validates the
      // pass geometry against an independent implementation
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h, s"($w,$h,$ct,il=$il)")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(img.getRaster.getSample(x, y, c) == f16(x, y, c),
          s"ImageIO ($w,$h,$ct,il=$il) sample ($x,$y,$c)")
    }
    // 8-bit interlaced round trip through the pipeline's decodePixels
    def f8(x: Int, y: Int, c: Int): Int = (3 + 3 * x + 7 * y + 11 * c) % 256
    for ((w, h, ct, ch) <- Seq((19, 13, 2, 3), (4, 11, 0, 1), (9, 2, 6, 4))) {
      val png = Multimodal.Png.encodeRaster(w, h, ct, 8, interlaced = true, f8)
      val (dw, dh, dch, px) = Multimodal.Png.decodePixels(png)
      assert((dw, dh, dch) == ((w, h, ch)), s"($w,$h,$ct)")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert((px((y * w + x) * ch + c) & 0xFF) == f8(x, y, c),
          s"interlaced-8 ($w,$h,$ct) sample ($x,$y,$c)")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert(img.getRaster.getSample(x, y, c) == f8(x, y, c),
          s"ImageIO interlaced-8 ($w,$h,$ct) sample ($x,$y,$c)")
    }
    // hand-built depth-2 palette stream: packed sub-byte indices
    // (MSB-first) expand through PLTE to the exact RGB triples
    val palette = Array[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val td = typ.getBytes("US-ASCII") ++ payload
      val crc = new java.util.zip.CRC32(); crc.update(td)
      java.nio.ByteBuffer.allocate(12 + payload.length)
        .putInt(payload.length).put(td).putInt(crc.getValue.toInt).array()
    }
    val (pw, ph) = (5, 3) // 5 2-bit indices per row → 2 bytes per scanline
    val idx = Array.tabulate(ph, pw)((y, x) => (x + y) % 4)
    val scan = (0 until ph).flatMap { y =>
      val b0 = (idx(y)(0) << 6) | (idx(y)(1) << 4) | (idx(y)(2) << 2) | idx(y)(3)
      Seq(0.toByte, b0.toByte, (idx(y)(4) << 6).toByte) // filter None
    }.toArray
    val defl = new java.util.zip.Deflater()
    defl.setInput(scan); defl.finish()
    val zo = new java.io.ByteArrayOutputStream()
    val zb = new Array[Byte](256)
    while (!defl.finished()) zo.write(zb, 0, defl.deflate(zb))
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(pw).putInt(ph)
      .put(2.toByte).put(3.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val palPng2 = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("PLTE", palette) ++
      chunk("IDAT", zo.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    val r2 = Multimodal.Png.decodeRaster(palPng2)
    assert((r2.width, r2.height, r2.channels, r2.bitDepth) == ((pw, ph, 3, 8)))
    for (y <- 0 until ph; x <- 0 until pw; c <- 0 until 3)
      assert(r2.samples((y * pw + x) * 3 + c) == palette(3 * idx(y)(x) + c) % 256,
        s"depth-2 palette pixel ($x,$y,$c)")
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

  test("Media sniffer: FOREIGN streams dispatch to the real codecs; junk takes the fallback") {
    // PNG leg, foreign bytes: ImageIO (not our writer) encodes the
    // stream — the sniffer must recognize it and the raster decode
    // must produce the true dimensions
    val img = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 9).foreach(y => (0 until 17).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val foreignPng = bos.toByteArray
    assert(Multimodal.Media.sniff(foreignPng) == "png")
    assert(Multimodal.Media.decode(foreignPng) == (("png", 17L, 9L, 3L)))

    // WAV leg, foreign bytes: javax.sound writes the RIFF stream
    val fmt = new javax.sound.sampled.AudioFormat(11025f, 16, 2, true, false)
    val pcm = Array.tabulate(24 * 2 * 2)(i => (i * 13).toByte) // 24 frames, 2ch, 16-bit
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 24L)
    val wbos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wbos)
    val foreignWav = wbos.toByteArray
    assert(Multimodal.Media.sniff(foreignWav) == "wav")
    assert(Multimodal.Media.decode(foreignWav) == (("wav", 24L, 11025L, 2L)))

    // neither magic: the declared deterministic fallback
    val junk = "no magic here, just text".getBytes("UTF-8")
    val n = junk.length.toLong
    assert(Multimodal.Media.sniff(junk) == "other")
    assert(Multimodal.Media.decode(junk) == (("other", n % 640 + 1, n * 7 % 480 + 1, 3L)))
    // a PNG signature with a corrupt body must THROW (real decode is
    // load-bearing), not fall back silently
    val corrupt = foreignPng.take(20)
    intercept[Exception] { Multimodal.Media.decode(corrupt) }
  }

  test("Media sniffer: ASCII text wearing RIFF/WAVE tags stays 'other'") {
    // unlike PNG's \x89, "RIFF....WAVE" is printable ASCII — a plain
    // text document can start with it. The sniff must NOT route such
    // text into the WAV decoder (which would throw on the garbage
    // body): it additionally requires the canonical 'fmt ' chunk at
    // offset 12 and a RIFF size field matching the payload.
    val riffText = "RIFFxxxxWAVE this is a plain sentence about audio files"
      .getBytes("US-ASCII")
    assert(Multimodal.Media.sniff(riffText) == "other")
    val n = riffText.length.toLong
    assert(Multimodal.Media.decode(riffText) ==
      (("other", n % 640 + 1, n * 7 % 480 + 1, 3L)))
    // even with 'fmt ' spelled out in the text, the size field (ASCII
    // "xxxx" = 2.0e9) cannot match the payload length
    val riffFmtText = "RIFFxxxxWAVEfmt sounds like a wav but is prose"
      .getBytes("US-ASCII")
    assert(Multimodal.Media.sniff(riffFmtText) == "other")
  }

  test("extractFeatures over a mixed corpus routes every row per its magic bytes") {
    val d = Seq((0L, "png row"), (1L, "wav row"), (2L, "text row"),
      (3L, "png again"), (4L, "wav again"), (5L, "more text"))
      .toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.withMixedPayload(d, "doc_id", "text", "payload"),
      "doc_id", "payload").collect()
    assert(out.length == 6)
    out.foreach { r =>
      val id = r.getAs[Long]("id")
      val kind = r.getAs[String]("kind")
      (id % 3) match {
        case 0 =>
          assert(kind == "png", s"id=$id")
          assert(r.getAs[Long]("width") == id % 24 + 1)
          assert(r.getAs[Long]("height") == id * 7 % 24 + 1)
          assert(r.getAs[Long]("channels") ==
            ((id / 3) % 3 match { case 0 => 1L; case 1 => 3L; case _ => 4L }))
          // the payload really is a PNG stream: signature in head_hex
          assert(r.getAs[String]("head_hex") == "89504E470D0A1A0A")
        case 1 =>
          assert(kind == "wav", s"id=$id")
          assert(r.getAs[Long]("width") == id % 32 + 1)      // frames
          assert(r.getAs[Long]("height") == 8000 + (id / 3) % 4 * 4000) // rate
          assert(r.getAs[Long]("channels") == (id / 3) % 2 + 1)
          assert(r.getAs[String]("head_hex").startsWith("52494646")) // "RIFF"
        case _ =>
          assert(kind == "other", s"id=$id")
          val n = r.getAs[Long]("n_bytes")
          assert(r.getAs[Long]("width") == n % 640 + 1)
          assert(r.getAs[Long]("height") == n * 7 % 480 + 1)
          assert(r.getAs[Long]("channels") == 3L)
      }
    }
  }
}
