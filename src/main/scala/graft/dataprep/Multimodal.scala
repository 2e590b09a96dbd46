package graft.dataprep

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The
  * Spark-side machinery — schema, partition-preserving mapPartitions
  * batch processing, deterministic output — is real, and so are the
  * two shipped codecs: [[Png]] (CRC'd chunk framing, deflate
  * scanlines with all five adaptive filters, palette, Adam7, bit
  * depths 1–16) and [[Wav]] (RIFF chunk walk, integer PCM 8/16-bit).
  * [[Media.decode]] sniffs the magic bytes and dispatches to them;
  * only payloads outside both formats take the one declared
  * deterministic fallback ([[Media.fallback]] — swap it for JavaCV/
  * TwelveMonkeys/ffmpeg pipes in production).
  */
object Multimodal {

  final case class MediaRow(id: Long, bytes: Array[Byte])
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      head_hex: String,
      kind: String,
      width: Long,
      height: Long,
      channels: Long)

  /** Magic-byte sniffer + codec dispatch — the generic-media decode
    * entry point. PNG (`\x89PNG\r\n\x1a\n`) routes to the real
    * [[Png.decodeRaster]] (full pixel decode, so a corrupt stream
    * throws rather than passing as header metadata); `RIFF....WAVE`
    * routes to the real [[Wav.decode]]. Anything else takes the ONE
    * declared fallback: deterministic pseudo-features from the byte
    * length — the stand-in for codec families this container lacks
    * (JPEG, MP3, H.264 …); swap [[fallback]] for JavaCV/TwelveMonkeys/
    * ffmpeg pipes in production. The dispatch itself, and both real
    * legs, are production plumbing.
    */
  object Media {
    def sniff(bytes: Array[Byte]): String =
      if (bytes.length >= 8 &&
          java.util.Arrays.equals(bytes.slice(0, 8), Png.Signature)) "png"
      // RIFF/WAVE needs more than the two tags: unlike PNG's \x89 (which
      // cannot lead UTF-8 text), "RIFF....WAVE" is printable ASCII — a
      // plain-text document could start with it and would then crash in
      // Wav.decode. Require the canonical layout our codec (and every
      // PCM encoder) emits: "fmt " as the first chunk at offset 12 AND
      // the RIFF size field (LE uint32 at 4) matching the payload —
      // a 4-byte binary length inside text is not plausible.
      else if (bytes.length >= 16 &&
          new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
          new String(bytes, 8, 4, "US-ASCII") == "WAVE" &&
          new String(bytes, 12, 4, "US-ASCII") == "fmt " &&
          ((bytes(4) & 0xFFL) | ((bytes(5) & 0xFFL) << 8) |
            ((bytes(6) & 0xFFL) << 16) | ((bytes(7) & 0xFFL) << 24)) ==
            bytes.length - 8L) "wav"
      else "other"

    /** Declared fallback for non-PNG/WAV payloads: deterministic
      * pseudo-features derived from the byte length (a real decoder
      * replaces exactly this function). */
    def fallback(bytes: Array[Byte]): (Long, Long, Long) = {
      val n = bytes.length.toLong
      (n % 640 + 1, (n * 7) % 480 + 1, 3L)
    }

    /** (kind, width, height, channels). PNG: raster dimensions from a
      * full pixel decode. WAV: (frames, sampleRate, channels) — the
      * audio analogue of a raster's shape. Other: [[fallback]]. */
    def decode(bytes: Array[Byte]): (String, Long, Long, Long) = sniff(bytes) match {
      case "png" =>
        val r = Png.decodeRaster(bytes)
        ("png", r.width.toLong, r.height.toLong, r.channels.toLong)
      case "wav" =>
        val (rate, ch, _, samples) = Wav.decode(bytes)
        ("wav", (samples.length / ch).toLong, rate.toLong, ch.toLong)
      case _ =>
        val (w, h, c) = fallback(bytes)
        ("other", w, h, c)
    }
  }

  private val hexDigits = "0123456789ABCDEF"
  private def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    for (b <- bytes) {
      sb += hexDigits((b >> 4) & 0xF)
      sb += hexDigits(b & 0xF)
    }
    sb.toString
  }

  /** Feature extraction over a binary column via typed mapPartitions —
    * the Scala analogue of a Pandas-UDF `mapInPandas` stage: rows
    * stream through per partition, the decode runs once per payload,
    * and the output schema is an explicit case class. The decode is
    * [[Media.decode]]: magic-byte dispatch to the real PNG/WAV codecs,
    * deterministic fallback otherwise — so the result stays oracle-
    * comparable (payload generators encode their parameters as id
    * arithmetic; n_bytes/head_hex mirror octet_length/hex(substr)).
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val (kind, w, h, c) = Media.decode(r.bytes)
        MediaFeatures(
          id = r.id,
          n_bytes = r.bytes.length.toLong,
          head_hex = hex(r.bytes.take(8)),
          kind = kind,
          width = w,
          height = h,
          channels = c)
      }
    }.toDF()
      .orderBy(col("id").asc)
  }

  /** Mixed-media payload — the corpus shape [[Media]]'s dispatch
    * exists for: PNG for id % 3 == 0, WAV for id % 3 == 1, raw UTF-8
    * text otherwise. All codec parameters are id arithmetic (widths,
    * depths, rates, frame functions) so an external oracle recomputes
    * every decoded feature without running either codec. */
  def withMixedPayload(df: DataFrame, idCol: String, textCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val payload = (id % 3) match {
          case 0 =>
            // FULL pixel streams (decodeRaster demands real scanlines),
            // small dims so a corpus-wide decode stays cheap
            val ct = ((id / 3) % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
            Png.encodePixels((id % 24 + 1).toInt, (id * 7 % 24 + 1).toInt, ct,
              (x, y, c) => ((id + 3L * x + 7L * y + 11L * c) % 256).toInt)
          case 1 =>
            val frames = (id % 32 + 1).toInt
            val ch = ((id / 3) % 2 + 1).toInt
            val rate = (8000 + ((id / 3) % 4) * 4000).toInt
            Wav.encodePcm(rate, ch, 16, frames,
              (f, c) => (((id + 13L * f + 17L * c) % 65536) - 32768).toInt)
          case _ =>
            Option(t).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (id, payload)
      })
      .toDF(idCol, outCol)
  }

  /** Build a binary "payload" column from text (the testdata carries no
    * real media; UTF-8 bytes stand in for the opaque blob). */
  def withTextPayload(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, encode(col(textCol), "UTF-8"))

  final case class FrameRow(
      id: Long, frame_idx: Long, off: Long, frame_len: Long, head_hex: String)

  /** Frame sampling over a "video" payload: treat the blob as a
    * sequence of fixed-`frameLen` frame records, emit every
    * `everyNth` frame up to `maxFrames` per document — the classic
    * decimation a vision pipeline runs before feature extraction. One
    * row per sampled frame (id, frame_idx, byte offset/length, head
    * bytes), produced by a partition-preserving typed flatMap: no
    * shuffle, output size bounded by maxFrames × docs regardless of
    * payload size. A real container parser replaces the fixed-length
    * framing; the row shape, bounds and batching are the production
    * plumbing.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameLen: Int = 256, everyNth: Int = 4, maxFrames: Int = 8): DataFrame = {
    require(frameLen > 0 && everyNth > 0 && maxFrames > 0, "positive params")
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
    typed.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.bytes.length
        val frameCount = (n + frameLen - 1) / frameLen
        Iterator.range(0, frameCount, everyNth).take(maxFrames).map { i =>
          val off = i.toLong * frameLen
          val len = math.min(frameLen.toLong, n - off)
          FrameRow(r.id, i.toLong, off, len,
            hex(r.bytes.slice(off.toInt, off.toInt + math.min(4L, len).toInt)))
        }
      }
    }.toDF()
      .orderBy(col("id").asc, col("frame_idx").asc)
  }

  final case class ResizedMeta(
      id: Long, src_w: Long, src_h: Long, dst_w: Long, dst_h: Long,
      est_bytes: Long)

  /** Resize planning for image payloads: fit (src_w, src_h) inside
    * (maxW, maxH) preserving aspect ratio, all in integer rational
    * arithmetic (floor(src·num/den), min 1) so the plan is bit-stable
    * and oracle-checkable. Upscaling is never planned (scale capped at
    * 1). [[Media.decode]] supplies source dims — real PNG/WAV decode
    * behind the magic-byte sniff, the declared fallback otherwise.
    */
  def resizePlan(df: DataFrame, idCol: String, binCol: String,
      maxW: Long, maxH: Long): DataFrame = {
    require(maxW > 0 && maxH > 0, "positive bounds")
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val (_, w, h, c) = Media.decode(r.bytes)
        // the binding constraint picks the rational scale; cap at 1:1
        val (num, den) =
          if (w * maxH <= h * maxW) (math.min(maxH, h), h)
          else (math.min(maxW, w), w)
        val dw = math.max(1L, w * num / den)
        val dh = math.max(1L, h * num / den)
        ResizedMeta(r.id, w, h, dw, dh, dw * dh * c)
      }
    }.toDF()
      .orderBy(col("id").asc)
  }

  // ---- real codec path: PNG (ISO/IEC 15948 / RFC 2083) ------------

  /** Minimal real PNG writer/parser pair — the one codec this
    * container can host without media libraries, because dimension
    * extraction needs only the container format: the 8-byte
    * signature, big-endian chunk framing, CRC-32-verified IHDR.
    * [[encode]] emits a structurally valid PNG stream (signature +
    * IHDR + placeholder IDAT + IEND, every chunk CRC'd); [[decode]]
    * parses REAL bytes back — signature check, chunk walk, CRC
    * verification, big-endian field reads — so the decode stage of
    * the multimodal pipeline is load-bearing, not a fake.
    * [[encode]]'s pixel payload is a placeholder (IDAT not sized to
    * the dimensions — cheap container-only payloads for metadata
    * rows); [[encodePixels]]/[[decodePixels]] below are the FULL
    * codec: real deflate-compressed scanlines with all five adaptive
    * filter types, inflate + per-scanline unfilter on read.
    */
  object Png {
    private[dataprep] val Signature = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    /** Paeth predictor (RFC 2083 §6.6): nearest of left/up/upper-left
      * to the linear estimate a + b - c, ties resolved a, b, c. */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def channelsOf(colorType: Int): Int = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case ct => throw new IllegalArgumentException(s"unsupported color type $ct")
    }

    private def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val typeAndData = typ.getBytes("US-ASCII") ++ payload
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      java.nio.ByteBuffer.allocate(12 + payload.length)
        .putInt(payload.length).put(typeAndData).putInt(crc.getValue.toInt)
        .array()
    }

    /** colorType: 0 grayscale, 2 truecolor, 6 truecolor+alpha. */
    def encode(width: Int, height: Int, colorType: Int): Array[Byte] = {
      require(width > 0 && height > 0, "positive dimensions")
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height)
        .put(8.toByte).put(colorType.toByte) // bit depth 8
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
        .array()
      Signature ++ chunk("IHDR", ihdr) ++
        chunk("IDAT", Array[Byte](0x78, 0x9C.toByte)) ++ // zlib header stub
        chunk("IEND", Array.emptyByteArray)
    }

    /** Adam7 pass geometry (RFC 2083 §2.6): (x0, y0, dx, dy). Each
      * pass is its own sub-image — own scanlines, own filter bytes. */
    private val Adam7: Array[(Int, Int, Int, Int)] =
      Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    /** The sub-images a stream carries: the whole image when not
      * interlaced, else the seven Adam7 passes with their computed
      * (x0, y0, dx, dy, passWidth, passHeight); empty passes excluded
      * (an empty pass contributes NO scanlines, not zero-length ones). */
    private def subImages(width: Int, height: Int,
        interlaced: Boolean): Seq[(Int, Int, Int, Int, Int, Int)] =
      if (!interlaced) Seq((0, 0, 1, 1, width, height))
      else Adam7.toSeq.map { case (x0, y0, dx, dy) =>
        (x0, y0, dx, dy,
          math.max(0, (width - x0 + dx - 1) / dx),
          math.max(0, (height - y0 + dy - 1) / dy))
      }.filter(p => p._5 > 0 && p._6 > 0)

    /** Encode a REAL image: `pixel(x, y, c)` supplies each sample
      * (row-major, channels interleaved; 8- or 16-bit wide), scanlines
      * are filtered with the adaptive filter cycle y % 5 — every
      * filter type (None/Sub/Up/Average/Paeth) appears in any
      * (sub-)image ≥ 5 rows tall, so a decoder bug in any one of them
      * surfaces — then deflate-compressed into a single IDAT. With
      * `interlaced` the seven Adam7 passes are emitted as independent
      * sub-images per the spec. Output is a standard-conformant PNG
      * ([[decodeRaster]] and the JDK's ImageIO both read it back
      * bit-exactly; spec-asserted). */
    def encodeRaster(width: Int, height: Int, colorType: Int,
        bitDepth: Int, interlaced: Boolean,
        pixel: (Int, Int, Int) => Int): Array[Byte] = {
      require(width > 0 && height > 0, "positive dimensions")
      require(bitDepth == 8 || bitDepth == 16,
        s"encodeRaster writes 8/16-bit, got $bitDepth")
      val ch = channelsOf(colorType)
      val bytesPer = bitDepth / 8
      val bpp = ch * bytesPer
      val passes = subImages(width, height, interlaced)
      val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
        (pw * bpp + 1) * ph
      }.sum
      val raw = new Array[Byte](rawLen)
      var pos = 0
      passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
        val stride = pw * bpp
        val recon = new Array[Byte](stride * ph) // unfiltered reference
        var y = 0
        while (y < ph) {
          var px = 0
          while (px < pw) {
            var c = 0
            while (c < ch) {
              val v = pixel(x0 + px * dx, y0 + y * dy, c)
              val i = y * stride + px * bpp + c * bytesPer
              if (bitDepth == 16) {
                recon(i) = ((v >> 8) & 0xFF).toByte
                recon(i + 1) = (v & 0xFF).toByte
              } else recon(i) = (v & 0xFF).toByte
              c += 1
            }
            px += 1
          }
          y += 1
        }
        y = 0
        while (y < ph) {
          val f = y % 5
          raw(pos) = f.toByte; pos += 1
          var k = 0
          while (k < stride) {
            val i = y * stride + k
            val v = recon(i) & 0xFF
            val left = if (k >= bpp) recon(i - bpp) & 0xFF else 0
            val up = if (y > 0) recon(i - stride) & 0xFF else 0
            val ul = if (y > 0 && k >= bpp) recon(i - stride - bpp) & 0xFF else 0
            val filtered = f match {
              case 0 => v
              case 1 => v - left
              case 2 => v - up
              case 3 => v - (left + up) / 2
              case _ => v - paeth(left, up, ul)
            }
            raw(pos) = (filtered & 0xFF).toByte; pos += 1
            k += 1
          }
          y += 1
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height)
        .put(bitDepth.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte)
        .put((if (interlaced) 1 else 0).toByte)
        .array()
      Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** The common 8-bit non-interlaced encode (see [[encodeRaster]]). */
    def encodePixels(width: Int, height: Int, colorType: Int,
        pixel: (Int, Int, Int) => Int): Array[Byte] =
      encodeRaster(width, height, colorType, 8, interlaced = false, pixel)

    /** A decoded raster: samples row-major, channels interleaved, each
      * in [0, 2^bitDepth); palette images come back expanded to 8-bit
      * RGB (channels = 3, bitDepth = 8). */
    final case class Raster(width: Int, height: Int, channels: Int,
        bitDepth: Int, samples: Array[Int])

    /** Full decode of the COMPLETE PNG raster model: signature +
      * CRC-verified chunk walk, then bit depths 1/2/4/8/16 (sub-byte
      * samples unpacked MSB-first), all five color types (palette via
      * PLTE, expanded to 8-bit RGB, out-of-range indexes rejected),
      * and Adam7 interlace (each pass unfiltered as its own sub-image,
      * then deinterlaced). Unfiltering runs at the spec's byte level
      * with bpp = max(1, channels·depth/8) — the exact inverse of the
      * five RFC 2083 filters. Throws on any malformed structure;
      * corrupt media must surface, not decode to zeros. */
    def decodeRaster(bytes: Array[Byte]): Raster = {
      require(bytes.length >= 45 &&
        java.util.Arrays.equals(bytes.slice(0, 8), Signature), "not a PNG")
      val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
      var width = 0; var height = 0; var depth = 0; var colorType = 0
      var interlaced = false
      var palette: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var seenIhdr = false; var seenIend = false
      while (!seenIend) {
        require(bb.remaining() >= 12, "truncated chunk")
        val len = bb.getInt()
        require(len >= 0 && bb.remaining() >= len + 8, "bad chunk length")
        val typeAndData = new Array[Byte](4 + len)
        bb.get(typeAndData)
        val storedCrc = bb.getInt()
        val crc = new java.util.zip.CRC32()
        crc.update(typeAndData)
        require(crc.getValue.toInt == storedCrc, "chunk CRC mismatch")
        new String(typeAndData, 0, 4, "US-ASCII") match {
          case "IHDR" =>
            require(!seenIhdr && len == 13, "bad IHDR")
            seenIhdr = true
            val f = java.nio.ByteBuffer.wrap(typeAndData, 4, len)
            width = f.getInt(); height = f.getInt()
            require(width > 0 && height > 0, "bad dimensions")
            depth = f.get() & 0xFF
            colorType = f.get() & 0xFF
            val okDepth: Set[Int] = colorType match {
              case 0         => Set(1, 2, 4, 8, 16)
              case 3         => Set(1, 2, 4, 8)
              case 2 | 4 | 6 => Set(8, 16)
              case ct => throw new IllegalArgumentException(s"bad color type $ct")
            }
            require(okDepth(depth),
              s"bad bit depth $depth for color type $colorType")
            require(f.get() == 0, "bad compression method")
            require(f.get() == 0, "bad filter method")
            val il = f.get() & 0xFF
            require(il <= 1, s"bad interlace method $il")
            interlaced = il == 1
          case "PLTE" =>
            require(seenIhdr && len > 0 && len % 3 == 0 && len <= 768, "bad PLTE")
            palette = java.util.Arrays.copyOfRange(typeAndData, 4, 4 + len)
          case "IDAT" =>
            require(seenIhdr, "IDAT before IHDR")
            idat.write(typeAndData, 4, len)
          case "IEND" => seenIend = true
          case _ => () // ancillary chunk: CRC checked above, skipped
        }
      }
      require(colorType != 3 || palette != null, "palette image without PLTE")
      val spp = colorType match { // samples per pixel on the wire
        case 0 | 3 => 1; case 2 => 3; case 4 => 2; case _ => 4
      }
      val bpp = math.max(1, spp * depth / 8)
      def rowB(pixels: Int) = (pixels * spp * depth + 7) / 8
      val passes = subImages(width, height, interlaced)
      val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
        (rowB(pw) + 1).toLong * ph
      }.sum
      require(rawLen <= Int.MaxValue - 8, "image too large")
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte](rawLen.toInt)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(n > 0 || !inflater.needsInput(), "truncated pixel data")
        off += n
      }
      require(off == raw.length, "pixel data shorter than dimensions")
      inflater.end()
      val out = new Array[Int](width * height * spp)
      var base = 0
      passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
        val rb = rowB(pw)
        val recon = new Array[Byte](rb * ph)
        var y = 0
        while (y < ph) {
          val f = raw(base + y * (rb + 1)) & 0xFF
          require(f <= 4, s"bad filter type $f")
          var k = 0
          while (k < rb) {
            val i = y * rb + k
            val x = raw(base + y * (rb + 1) + 1 + k) & 0xFF
            val left = if (k >= bpp) recon(i - bpp) & 0xFF else 0
            val up = if (y > 0) recon(i - rb) & 0xFF else 0
            val ul = if (y > 0 && k >= bpp) recon(i - rb - bpp) & 0xFF else 0
            val rec = f match {
              case 0 => x
              case 1 => x + left
              case 2 => x + up
              case 3 => x + (left + up) / 2
              case _ => x + paeth(left, up, ul)
            }
            recon(i) = (rec & 0xFF).toByte
            k += 1
          }
          y += 1
        }
        base += (rb + 1) * ph
        var py = 0
        while (py < ph) {
          val rowStart = py * rb
          var px = 0
          while (px < pw) {
            val destPix = ((y0 + py * dy) * width + (x0 + px * dx)) * spp
            var c = 0
            while (c < spp) {
              val sIdx = px * spp + c
              out(destPix + c) = depth match {
                case 16 =>
                  ((recon(rowStart + 2 * sIdx) & 0xFF) << 8) |
                    (recon(rowStart + 2 * sIdx + 1) & 0xFF)
                case 8 => recon(rowStart + sIdx) & 0xFF
                case d =>
                  val per = 8 / d
                  val b = recon(rowStart + sIdx / per) & 0xFF
                  (b >> (8 - d * (sIdx % per + 1))) & ((1 << d) - 1)
              }
              c += 1
            }
            px += 1
          }
          py += 1
        }
      }
      if (colorType == 3) {
        val n = palette.length / 3
        val rgb = new Array[Int](width * height * 3)
        var i = 0
        while (i < width * height) {
          val ix = out(i)
          require(ix < n, s"palette index $ix out of range ($n entries)")
          rgb(3 * i) = palette(3 * ix) & 0xFF
          rgb(3 * i + 1) = palette(3 * ix + 1) & 0xFF
          rgb(3 * i + 2) = palette(3 * ix + 2) & 0xFF
          i += 1
        }
        Raster(width, height, 3, 8, rgb)
      } else Raster(width, height, spp, depth, out)
    }

    /** Decode to 8-bit bytes — the shape the pixel pipeline consumes.
      * Delegates to [[decodeRaster]]; a 16-bit stream must be read via
      * decodeRaster explicitly (no silent 16→8-bit truncation here).
      * Returns (width, height, channels, pixels) with pixels
      * row-major, channels interleaved. */
    def decodePixels(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val r = decodeRaster(bytes)
      require(r.bitDepth <= 8,
        "16-bit raster: read it via decodeRaster (no silent 8-bit truncation)")
      val px = new Array[Byte](r.samples.length)
      var i = 0
      while (i < px.length) { px(i) = r.samples(i).toByte; i += 1 }
      (r.width, r.height, r.channels, px)
    }

    /** Parse (width, height, channels) from real PNG bytes: verify the
      * signature, walk to IHDR, CRC-check it, read the big-endian
      * fields. Throws on malformed input — corrupt media must surface,
      * not pass as zeros. */
    def decode(bytes: Array[Byte]): (Long, Long, Long) = {
      require(bytes.length >= 33 &&
        java.util.Arrays.equals(bytes.slice(0, 8), Signature), "not a PNG")
      val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
      val len = bb.getInt()
      val typeAndData = new Array[Byte](4 + len)
      bb.get(typeAndData)
      require(new String(typeAndData, 0, 4, "US-ASCII") == "IHDR", "IHDR must be first")
      val storedCrc = bb.getInt()
      val crc = new java.util.zip.CRC32()
      crc.update(typeAndData)
      require(crc.getValue.toInt == storedCrc, "IHDR CRC mismatch")
      val f = java.nio.ByteBuffer.wrap(typeAndData, 4, len)
      val w = f.getInt().toLong; val h = f.getInt().toLong
      f.get() // bit depth
      val channels = f.get() match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case ct => throw new IllegalArgumentException(s"bad color type $ct")
      }
      (w, h, channels)
    }
  }

  /** WAV/PCM — the second REAL codec of the multimodal story, pure-JVM
    * like [[Png]]. [[encodePcm]] writes a canonical RIFF/WAVE stream
    * (RIFF size header, `fmt ` PCM chunk, little-endian interleaved
    * `data` chunk); [[decode]] walks the chunk list generically
    * (unknown chunks — LIST/fact/cue — are skipped by their declared
    * size, word-aligned per the RIFF padding rule), validates the PCM
    * format fields, and decodes the little-endian samples (signed
    * 16-bit, or unsigned 8-bit re-centred to signed) back to ints.
    * Throws on any malformed structure — corrupt media must surface,
    * not decode to silence. */
  object Wav {
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

    /** PCM encode: `sample(frame, channel)` supplies each sample —
      * signed [-32768, 32767] for 16-bit, unsigned [0, 255] for 8-bit. */
    def encodePcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
        nFrames: Int, sample: (Int, Int) => Int): Array[Byte] = {
      require(channels > 0 && nFrames >= 0 && sampleRate > 0, "bad params")
      require(bitsPerSample == 8 || bitsPerSample == 16,
        s"PCM 8/16-bit only, got $bitsPerSample")
      val blockAlign = channels * bitsPerSample / 8
      val dataLen = nFrames * blockAlign
      val out = new java.io.ByteArrayOutputStream(44 + dataLen)
      out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
      out.write(le16(1)) // audio format: PCM
      out.write(le16(channels)); out.write(le32(sampleRate))
      out.write(le32(sampleRate * blockAlign)); out.write(le16(blockAlign))
      out.write(le16(bitsPerSample))
      out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < channels) {
          val v = sample(f, c)
          out.write(v & 0xFF)
          if (bitsPerSample == 16) out.write((v >> 8) & 0xFF)
          c += 1
        }
        f += 1
      }
      out.toByteArray
    }

    /** (sampleRate, channels, bitsPerSample, samples) — samples frame-
      * major, channels interleaved; 8-bit unsigned is re-centred to
      * signed (v − 128) so both depths share one zero-centred range. */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
      def le16At(off: Int): Int =
        (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      def le32At(off: Int): Int =
        (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
          ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
      require(bytes.length >= 44, "not a WAV: too short")
      require(ascii(0) == "RIFF" && ascii(8) == "WAVE", "not a RIFF/WAVE stream")
      require((le32At(4).toLong & 0xFFFFFFFFL) + 8 <= bytes.length,
        "truncated RIFF payload")
      var off = 12
      var rate = 0; var ch = 0; var bits = 0; var fmtSeen = false
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length && (dataOff < 0 || !fmtSeen)) {
        val id = ascii(off); val len = le32At(off + 4)
        require(len >= 0 && off + 8 + len <= bytes.length, s"truncated chunk '$id'")
        id match {
          case "fmt " =>
            require(len >= 16, "short fmt chunk")
            val audioFormat = le16At(off + 8)
            require(audioFormat == 1, s"not integer PCM (wFormatTag=$audioFormat)")
            ch = le16At(off + 10); rate = le32At(off + 12)
            bits = le16At(off + 22)
            require(ch > 0 && rate > 0, "bad fmt fields")
            require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
            require(le16At(off + 20) == ch * bits / 8, "blockAlign mismatch")
            fmtSeen = true
          case "data" => dataOff = off + 8; dataLen = len
          case _      => () // LIST/fact/cue etc: skipped by declared size
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      require(fmtSeen, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      val bytesPerSample = bits / 8
      require(dataLen % (ch * bytesPerSample) == 0,
        "data chunk not a whole number of frames")
      val n = dataLen / bytesPerSample
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          if (bits == 16) (le16At(dataOff + 2 * i) << 16) >> 16 // sign-extend
          else (bytes(dataOff + i) & 0xFF) - 128
        i += 1
      }
      (rate, ch, bits, samples)
    }
  }

  /** Attach a REAL synthetic PNG payload per row: dimensions derived
    * deterministically from the id (so an oracle can recompute them),
    * bytes built by the actual [[Png.encode]] writer. Typed
    * partition-preserving map, no shuffle — the production shape of a
    * media-materialization stage. */
  def withPngPayload(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 640 + 1).toInt
        val h = (id * 7 % 480 + 1).toInt
        val ct = (id % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
        (id, Png.encode(w, h, ct))
      })
      .toDF(idCol, outCol)
  }

  final case class PngMeta(id: Long, width: Long, height: Long, channels: Long)

  /** Decode REAL PNG bytes to (width, height, channels) through the
    * typed mapPartitions path — same dataflow as [[extractFeatures]],
    * but the decoder is the genuine article ([[Png.decode]]: signature,
    * chunk walk, CRC, big-endian reads), so this row proves the
    * multimodal plumbing end-to-end on actual binary structure. */
  def decodePngMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, c) = Png.decode(r.bytes)
        PngMeta(r.id, w, h, c)
      })
      .toDF()
      .orderBy(col("id").asc)
  }

  final case class PngPixels(
      id: Long, width: Long, height: Long, channels: Long,
      n_pixel_bytes: Long, pixel_sum: Long)

  /** Attach a fully-real PNG per row — [[Png.encodePixels]] with
    * id-derived dimensions and the closed-form sample function
    * (id + 3x + 7y + 11c) mod 256, filters cycling per scanline.
    * Dimensions are kept small (≤16×16) so the ORACLE can afford to
    * re-enumerate every sample; the codec itself is size-generic. */
  def withPngPixelPayload(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id * 7 % 16 + 1).toInt
        val ct = (id % 3) match { case 0 => 0; case 1 => 2; case _ => 6 }
        (id, Png.encodePixels(w, h, ct,
          (x, y, c) => ((id + 3L * x + 7L * y + 11L * c) % 256).toInt))
      })
      .toDF(idCol, outCol)
  }

  /** Decode REAL pixel data — inflate + unfilter via
    * [[Png.decodePixels]] — and reduce it to oracle-checkable
    * aggregates: dimensions, raster size, and the sum of every
    * unsigned 8-bit sample. Any bug in the inflate, the filter
    * inverses, or the scanline geometry shifts `pixel_sum`. Same
    * partition-preserving typed mapPartitions dataflow as
    * [[extractFeatures]]. */
  def decodePngPixels(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, ch, px) = Png.decodePixels(r.bytes)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i) & 0xFF; i += 1 }
        PngPixels(r.id, w.toLong, h.toLong, ch.toLong, px.length.toLong, sum)
      })
      .toDF()
      .orderBy(col("id").asc)
  }

  final case class PngRaster(
      id: Long, width: Long, height: Long, channels: Long, bit_depth: Long,
      n_samples: Long, sample_sum: Long)

  /** Attach a 16-bit PNG per row — [[Png.encodeRaster]] at bit depth
    * 16, grayscale/truecolor alternating by id % 2, ADAM7-INTERLACED
    * for every id % 4 < 2 — with the closed-form sample
    * (id + 3x + 7y + 11c) mod 65536. Small dimensions (≤ 16×16) keep
    * the oracle's re-enumeration affordable; the codec is
    * size-generic. */
  def withPngRasterPayload(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (id % 16 + 1).toInt
        val h = (id * 7 % 16 + 1).toInt
        val ct = if (id % 2 == 0) 0 else 2
        (id, Png.encodeRaster(w, h, ct, 16, interlaced = id % 4 < 2,
          (x, y, c) => ((id + 3L * x + 7L * y + 11L * c) % 65536).toInt))
      })
      .toDF(idCol, outCol)
  }

  /** Decode 16-bit (half of them Adam7-interlaced) PNG bytes via
    * [[Png.decodeRaster]] and reduce to oracle-checkable aggregates:
    * dimensions, declared depth, and the sum of every 16-bit sample.
    * Deinterlacing must be INVISIBLE here — interlaced and plain
    * streams of the same id arithmetic produce identical rows — so
    * any bug in pass geometry, per-pass unfiltering, or big-endian
    * sample assembly shifts `sample_sum` and goes red. */
  def decodePngRaster(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val ras = Png.decodeRaster(r.bytes)
        var sum = 0L
        var i = 0
        while (i < ras.samples.length) { sum += ras.samples(i); i += 1 }
        PngRaster(r.id, ras.width.toLong, ras.height.toLong,
          ras.channels.toLong, ras.bitDepth.toLong,
          ras.samples.length.toLong, sum)
      })
      .toDF()
      .orderBy(col("id").asc)
  }

  final case class WavSamples(
      id: Long, sample_rate: Long, channels: Long, bits: Long,
      n_frames: Long, sample_sum: Long)

  /** Attach a real RIFF/WAVE PCM payload per row — [[Wav.encodePcm]]
    * with id-derived rate/channels/length and the closed-form sample
    * ((id + 13f + 17c) mod 65536) − 32768, so an oracle can
    * re-enumerate every 16-bit sample. Frame counts are kept small
    * (≤ 32) for oracle affordability; the codec itself is size-generic. */
  def withWavPayload(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map { id =>
        val frames = (id % 32 + 1).toInt
        val ch = (id % 2 + 1).toInt
        val rate = (8000 + (id % 4) * 4000).toInt
        (id, Wav.encodePcm(rate, ch, 16, frames,
          (f, c) => (((id + 13L * f + 17L * c) % 65536) - 32768).toInt))
      })
      .toDF(idCol, outCol)
  }

  /** Decode real WAV bytes — RIFF chunk walk, PCM validation, little-
    * endian sample decode via [[Wav.decode]] — and reduce to oracle-
    * checkable aggregates: format fields, frame count, and the sum of
    * every signed sample. Any byte-order, alignment, or chunk-walk bug
    * shifts `sample_sum`. Mirror of [[decodePngPixels]] for the audio
    * leg of the multimodal story; same partition-preserving typed
    * mapPartitions dataflow. */
  def decodeWavSamples(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val (rate, ch, bits, samples) = Wav.decode(r.bytes)
        var sum = 0L; var i = 0
        while (i < samples.length) { sum += samples(i); i += 1 }
        WavSamples(r.id, rate.toLong, ch.toLong, bits.toLong,
          samples.length.toLong / ch, sum)
      })
      .toDF()
      .orderBy(col("id").asc)
  }

  /** Shard manifest for opaque binary payloads — the index a training
    * dataloader needs to seek blobs out of size-budgeted shard files:
    * (id, n_bytes, shard, offset). Shard assignment is
    * [[Packing.packShards]]'s first-fit-by-prefix rule (a blob belongs
    * to the shard its EXCLUSIVE byte prefix falls in, so the
    * boundary-crossing blob stays whole in its floor shard); offsets
    * are CONTIGUOUS within each shard (a shard file is written
    * back-to-back in id order, no gaps).
    *
    * Scale: the global prefix sum is the two-phase distributed scan
    * (no global window); the within-shard offset adds one exchange
    * keyed by shard id — rows per shard are bounded by
    * budget/min-blob-size by construction, so the key spreads as data
    * grows. Nothing touches the payload bytes themselves: the manifest
    * is computed from lengths only, so the blob column never shuffles.
    */
  def blobShardManifest(df: DataFrame, idCol: String, binCol: String,
      budgetBytes: Long): DataFrame = {
    require(budgetBytes > 0, "budgetBytes must be positive")
    val sized = df.select(col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"))
    val wShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Packing.packShards(sized, idCol, "n_bytes", budgetBytes)
      .withColumn("offset", coalesce(sum(col("n_bytes")).over(wShard), lit(0L)))
      .select(col(idCol), col("n_bytes"), col("shard"), col("offset"))
      .orderBy(col(idCol).asc)
  }
}
