package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata, and per-batch
  * decode / feature-extract / resize / frame-sample stages run as
  * partition-local batch functions (`mapPartitions` over `Row`
  * iterators — the Scala analogue of `mapInPandas`: one arrow-batch
  * shaped function per partition, never per row).
  *
  * Container codecs are REAL pure-JVM parsers for all three
  * modalities: [[decodeWav]] (PCM WAV), [[decodeBmp]] (24-bit BMP),
  * [[decodePng]] (8-bit gray/RGB PNG — chunk walk, CRC-32 verify,
  * zlib INFLATE, all five scanline filters), [[decodeAvi]]
  * (RIFF/AVI demux) and [[decodeJpeg]] (baseline-sequential JPEG —
  * marker walk, canonical-Huffman entropy decode, dequantize, 2-D
  * IDCT), which also runs per `00dc` frame chunk inside the AVI demux:
  * the MJPEG intra-frame path, so video features derive from decoded
  * PIXELS. Payloads matching no signature fall to a deterministic stub
  * kernel ([[stubDecode]]) — the Spark-side contract (schema, batch
  * shape, partitioning, null handling) is identical on both paths.
  *
  * Scale design: payload bytes never shuffle — all media stages are
  * narrow partition-local maps; only extracted (small, typed) features
  * flow into joins/aggregations downstream. Control
  * `spark.sql.files.maxPartitionBytes` so one partition of payloads
  * fits executor memory.
  */
object Multimodal {

  /** Schema of a media channel: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)
  ))

  /** Feature schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)
  ))

  /** STUB decode kernel — deterministic fake standing in for a real
    * codec (`???` boundary): derives an 8-dim "feature" from byte
    * statistics of the payload. Real implementation would decode the
    * image/audio and pool activations; everything around it (batching,
    * schema, null pass-through) is the production shape. WAV/BMP/AVI
    * payloads do NOT reach this stub — those decoders are real.
    */
  def stubDecode(kind: String, payload: Array[Byte]): Array[Double] = {
    // ??? real codec goes here; deterministic fake below — a codepoint
    // histogram (not raw bytes) so the cross-engine oracle holds for
    // multi-byte UTF-8 payloads too
    if (payload == null) null
    else {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      val bins = new Array[Double](8)
      var n = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        bins(cp & 7) += 1.0
        n += 1
        i += Character.charCount(cp)
      }
      bins.map(_ / math.max(n, 1).toDouble)
    }
  }

  // ---- real WAV codec (pure JVM, no media libraries) ---------------------

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** True iff the payload carries a RIFF/WAVE header whose declared
    * chunk size matches the actual byte count — strict on purpose, so
    * arbitrary text that happens to start with "RIFF" can never be
    * misrouted into the decoder (the mm oracles depend on the
    * dispatch being deterministic).
    */
  def isWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 44 &&
      tag(payload, 0) == "RIFF" && tag(payload, 8) == "WAVE" &&
      leInt(payload, 4) == payload.length - 8

  /** Raw PCM samples from a WAV payload: walks the RIFF chunk list
    * (arbitrary chunk order, skips unknown chunks — LIST/fact/etc.),
    * validates PCM mono 16-bit from the `fmt ` chunk, returns the
    * sign-extended samples. Null on any structural violation
    * (truncated chunk, non-PCM, missing fmt/data) — the caller
    * decides the fallback, nothing is silently guessed.
    */
  def decodeWavSamples(payload: Array[Byte]): Array[Int] = {
    if (!isWav(payload)) return null
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val sz = leInt(payload, off + 4)
      if (sz < 0 || off + 8 + sz > payload.length) return null // truncated chunk
      id match {
        case "fmt " =>
          if (sz < 16) return null
          val audioFormat = leShort(payload, off + 8)
          val channels = leShort(payload, off + 10)
          val bits = leShort(payload, off + 22)
          if (audioFormat != 1 || channels != 1 || bits != 16) return null // PCM mono i16 only
          fmtOk = true
        case "data" =>
          dataOff = off + 8
          dataLen = sz
        case _ => () // unknown chunk (LIST, fact, …): skip
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0) return null
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (leShort(payload, dataOff + 2 * i) << 16) >> 16 // sign-extend
      i += 1
    }
    out
  }

  /** REAL decode path for WAV payloads — [[decodeWavSamples]]
    * histogrammed into 8 amplitude-class bins (`sample & 7`,
    * normalized by sample count). Null propagates from the sample
    * decode.
    */
  def decodeWav(payload: Array[Byte]): Array[Double] = {
    val samples = decodeWavSamples(payload)
    if (samples == null) return null
    val n = samples.length
    val bins = new Array[Double](8)
    var i = 0
    while (i < n) {
      bins(samples(i) & 7) += 1.0
      i += 1
    }
    bins.map(_ / math.max(n, 1).toDouble)
  }

  // ---- real BMP codec (pure JVM, no media libraries) ---------------------

  /** True iff the payload carries a BMP header whose declared file size
    * matches the actual byte count — strict like [[isWav]], so text
    * payloads starting with "BM" can never be misrouted into the
    * decoder.
    */
  def isBmp(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte &&
      leInt(payload, 2) == payload.length &&
      leInt(payload, 14) == 40 // BITMAPINFOHEADER

  /** REAL decode path for BMP payloads: parses the BITMAPINFOHEADER
    * (24-bit uncompressed only), walks the padded pixel rows, and
    * histograms the pixels into 8 luminance-class bins (`blue & 7`,
    * normalized by pixel count — for the synthetic grayscale payloads
    * all three channels agree). Returns null on any structural
    * violation (wrong bpp, compression, out-of-bounds pixel array) —
    * caller decides the fallback, nothing is silently guessed.
    */
  def decodeBmp(payload: Array[Byte]): Array[Double] = {
    if (!isBmp(payload)) return null
    val dataOff = leInt(payload, 10)
    val width = leInt(payload, 18)
    val height = leInt(payload, 22) // negative = top-down; sign only flips row order
    val planes = leShort(payload, 26)
    val bpp = leShort(payload, 28)
    val compression = leInt(payload, 30)
    if (planes != 1 || bpp != 24 || compression != 0) return null
    // Long arithmetic for the geometry: a crafted width >= ~716M makes
    // 3*width wrap negative in Int, letting the bound check pass and
    // the pixel loop throw instead of honoring the null-on-violation
    // contract; abs(Int.MinValue) is itself negative
    if (width < 0 || dataOff < 54 || height == Int.MinValue) return null
    val rows = math.abs(height)
    val rowSize = ((3L * width + 3L) / 4L) * 4L // rows pad to 4-byte boundaries
    // division-based bound: rowSize·rows can overflow even LONG when
    // both are ~2^31-scale, which would wrap negative and pass a
    // multiplicative check
    if (dataOff > payload.length) return null
    if (rowSize > 0 && rows.toLong > (payload.length.toLong - dataOff) / rowSize) return null
    if (width == 0 || rows == 0) return new Array[Double](8) // no pixels, no loop
    val rowSizeI = rowSize.toInt // safe: bound above caps it under payload.length
    val bins = new Array[Double](8)
    var r = 0
    while (r < rows) {
      var x = 0
      while (x < width) {
        bins(payload(dataOff + r * rowSizeI + 3 * x) & 7) += 1.0
        x += 1
      }
      r += 1
    }
    val n = width.toLong * rows
    bins.map(_ / math.max(n, 1L).toDouble)
  }

  /** Raw gray values (blue-channel bytes, row-major) from a 24-bit
    * BMP — the pixel-level view [[decodeBmp]]'s histogram collapses;
    * same structural-violation contract (null, never a guess).
    */
  def decodeBmpGray(payload: Array[Byte]): Array[Int] = {
    if (!isBmp(payload)) return null
    val dataOff = leInt(payload, 10)
    val width = leInt(payload, 18)
    val height = leInt(payload, 22)
    val planes = leShort(payload, 26)
    val bpp = leShort(payload, 28)
    val compression = leInt(payload, 30)
    if (planes != 1 || bpp != 24 || compression != 0) return null
    // same Long-geometry hardening as decodeBmp: Int wrap on 3*width /
    // width*rows must return null, never throw
    if (width < 0 || dataOff < 54 || height == Int.MinValue) return null
    val rows = math.abs(height)
    val rowSize = ((3L * width + 3L) / 4L) * 4L
    // same division-based bound as decodeBmp: the product form can
    // overflow LONG and wrap past the check
    if (dataOff > payload.length) return null
    if (rowSize > 0 && rows.toLong > (payload.length.toLong - dataOff) / rowSize) return null
    if (width == 0 || rows == 0) return new Array[Int](0)
    val nPx = width.toLong * rows
    if (nPx > Int.MaxValue) return null // unreachable once bound holds; belt+braces
    val rowSizeI = rowSize.toInt
    val out = new Array[Int](nPx.toInt)
    var r = 0
    var i = 0
    while (r < rows) {
      var x = 0
      while (x < width) {
        out(i) = payload(dataOff + r * rowSizeI + 3 * x) & 0xFF
        i += 1
        x += 1
      }
      r += 1
    }
    out
  }

  private val aHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false)))

  /** Perceptual image hash (average hash) over DECODED pixels
    * (round-9 mm8): 64 evenly-spaced gray samples (`pixel at
    * ⌊j·n/64⌋` — the deterministic stand-in for the canonical 8×8
    * resize, exact on any image size), one bit per sample =
    * `sample·64 > Σsamples` (integer cross-multiplication, no mean
    * division), packed into a 64-bit long. Images that crop/recompress
    * but keep content produce equal or near-equal hashes — the
    * image-dedup signature text dedup cannot provide. Rows whose
    * payload fails the strict BMP decode are dropped.
    *
    * Scale shape: decode + hash are partition-local; one narrow row
    * per image.
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(aHashSchema)
    media.select("media_id", "payload").mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val px = decodeBmpGray(r.getAs[Array[Byte]]("payload"))
        if (px == null || px.length == 0) None
        else {
          val n = px.length
          val samples = Array.tabulate(64)(j => px(((j.toLong * n) / 64).toInt))
          val sum = samples.map(_.toLong).sum
          var hash = 0L
          var j = 0
          while (j < 64) {
            if (samples(j) * 64L > sum) hash |= (1L << j)
            j += 1
          }
          Some(Row(r.getLong(0), hash, n.toLong))
        }
      }
    }(enc)
  }

  /** [[imageAHash]] with exact-signature dup groups: each image row
    * carries its hash's group size — group_size ≥ 2 is the
    * perceptual-duplicate set (identical content up to the sampling
    * grid). One hash-keyed partial-agg'd exchange on 8-byte keys.
    */
  def imageAHashGroups(media: DataFrame): DataFrame = {
    val h = imageAHash(media)
    h.join(h.groupBy(col("ahash")).agg(count(lit(1)).as("group_size")),
      Seq("ahash"))
      .select(col("media_id"), col("ahash"), col("n_px"), col("group_size"))
  }

  // ---- real PNG codec (pure JVM: java.util.zip Inflater/CRC32) -----------

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** True iff the payload starts with the 8-byte PNG signature and is
    * long enough to hold the mandatory IHDR/IDAT/IEND chunks. The
    * signature's non-ASCII first byte makes text misrouting impossible
    * (the strictness [[isWav]]/[[isBmp]] get from size checks).
    */
  def isPng(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 + 25 + 12 + 12 &&
      (0 until 8).forall(i => payload(i) == pngSig(i))

  /** REAL decode path for PNG payloads: walks the chunk stream
    * (verifying each CRC-32), parses IHDR (8-bit depth, grayscale or
    * truecolor, no interlace), concatenates IDAT, INFLATEs the zlib
    * stream (`java.util.zip.Inflater` — stored and compressed deflate
    * blocks alike), reverses the per-row scanline filter (all five
    * types: None/Sub/Up/Average/Paeth), and histograms the first
    * channel into the shared 8 luminance-class bins. Returns null on
    * any structural violation (bad CRC, truncated chunk or stream,
    * unsupported depth/color/interlace, unknown filter type) — caller
    * decides the fallback, nothing is silently guessed.
    */
  def decodePng(payload: Array[Byte]): Array[Double] = {
    if (!isPng(payload)) return null
    var off = 8
    var width = -1; var height = -1; var bitDepth = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && off + 12 <= payload.length) {
      val len = beInt(payload, off)
      if (len < 0 || off + 12 + len > payload.length) return null
      val crc = new java.util.zip.CRC32()
      crc.update(payload, off + 4, 4 + len)
      if (crc.getValue != (beInt(payload, off + 8 + len).toLong & 0xffffffffL)) return null
      new String(payload, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
        case "IHDR" =>
          if (len != 13) return null
          width = beInt(payload, off + 8); height = beInt(payload, off + 12)
          bitDepth = payload(off + 16) & 0xff; colorType = payload(off + 17) & 0xff
          // compression method, filter method, interlace must be 0
          if (payload(off + 18) != 0 || payload(off + 19) != 0 || payload(off + 20) != 0)
            return null
        case "IDAT" => idat.write(payload, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) skipped
      }
      off += 12 + len
    }
    if (!sawEnd || width < 0 || height < 0 || bitDepth != 8) return null
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case _ => return null
    }
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, got, raw.length - got)
        if (k == 0 && inf.needsInput()) return null // truncated stream
        got += k
      }
      if (got != raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // reverse the scanline filters in place (out holds unfiltered bytes)
    val out = new Array[Int](stride * height)
    var r = 0
    while (r < height) {
      val ft = raw(r * (stride + 1)) & 0xff
      if (ft > 4) return null
      var i = 0
      while (i < stride) {
        val x = raw(r * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= channels) out(r * stride + i - channels) else 0
        val b = if (r > 0) out((r - 1) * stride + i) else 0
        val c = if (r > 0 && i >= channels) out((r - 1) * stride + i - channels) else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out(r * stride + i) = v & 0xff
        i += 1
      }
      r += 1
    }
    val bins = new Array[Double](8)
    r = 0
    while (r < height) {
      var xw = 0
      while (xw < width) {
        bins(out(r * stride + xw * channels) & 7) += 1.0
        xw += 1
      }
      r += 1
    }
    val n = width.toLong * height
    bins.map(_ / math.max(n, 1L).toDouble)
  }

  /** Build a minimal valid 8-bit grayscale PNG around the given pixels
    * — the synthetic payload generator for (half the) image-kind
    * media. `filterType` applies that scanline filter to every row
    * (the decoder reverses it; tests drive all five). The zlib stream
    * uses STORED deflate blocks so the file size is a closed-form
    * function of the pixel count (the oracle predicts `n_bytes` in
    * SQL: 64 + pixels + 5·ceil((pixels/row + 1)·rows / 65535) for the
    * n×1 shape) — Inflater treats stored and compressed blocks
    * identically, so the decoder stays fully general.
    */
  def pngEncode(pixels: Array[Byte], width: Int, height: Int, filterType: Int = 0): Array[Byte] = {
    require(width * height == pixels.length, "pngEncode: dims must cover pixels")
    require(filterType >= 0 && filterType <= 4, "pngEncode: filter type 0..4")
    val stride = width
    val raw = new Array[Byte]((stride + 1) * height)
    var r = 0
    while (r < height) {
      raw(r * (stride + 1)) = filterType.toByte
      var i = 0
      while (i < stride) {
        val x = pixels(r * stride + i) & 0xff
        val a = if (i >= 1) pixels(r * stride + i - 1) & 0xff else 0
        val b = if (r > 0) pixels((r - 1) * stride + i) & 0xff else 0
        val c = if (r > 0 && i >= 1) pixels((r - 1) * stride + i - 1) & 0xff else 0
        val f = filterType match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(r * (stride + 1) + 1 + i) = f.toByte
        i += 1
      }
      r += 1
    }
    // zlib with stored blocks: 0x78 0x01 header, 5-byte block headers,
    // Adler-32 trailer
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    val nBlocks = math.max(1, (raw.length + 65534) / 65535)
    val z = java.nio.ByteBuffer.allocate(2 + 5 * nBlocks + raw.length + 4)
    z.put(0x78.toByte).put(0x01.toByte)
    var poff = 0
    var bi = 0
    while (bi < nBlocks) {
      val blen = math.min(65535, raw.length - poff)
      z.put(if (bi == nBlocks - 1) 1.toByte else 0.toByte)
      z.put((blen & 0xff).toByte).put(((blen >> 8) & 0xff).toByte)
      z.put((~blen & 0xff).toByte).put(((~blen >> 8) & 0xff).toByte)
      z.put(raw, poff, blen)
      poff += blen
      bi += 1
    }
    z.putInt(adler.getValue.toInt)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      b.putInt(data.length).put(tb).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    pngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.array()) ++ chunk("IEND", Array.emptyByteArray)
  }

  // ---- real baseline JPEG codec (pure JVM, no media libraries) -----------

  /** True iff the payload starts with the JPEG SOI marker. */
  def isJpeg(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8

  /** Decoded JPEG surface: dims + row-major 0..255 gray pixels. */
  final case class JpegImage(width: Int, height: Int, pixels: Array[Int])

  /** Natural-order index for each zigzag position (ITU T.81 fig. A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · c(u), the 1-D DCT-III basis with its
    * normalization folded in — shared by the decoder IDCT and the
    * fixture encoder's forward DCT.
    */
  private val DctBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman codes from a DHT-shaped (counts-per-length,
    * symbols) pair: `codes(i)` = (code, length) for `symbols(i)`
    * (ITU T.81 annex C code assignment — shared by encode and decode
    * so the two sides cannot drift).
    */
  private def huffCanonical(counts: Array[Int], nSyms: Int): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](nSyms)
    var code = 0
    var i = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < counts(l - 1)) { out(i) = (code, l); code += 1; i += 1; c += 1 }
      code <<= 1
      l += 1
    }
    out
  }

  /** The two's-complement "extend" of T.81 F.2.2.1: an `s`-bit raw
    * value to its signed coefficient.
    */
  private def jpegExtend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** REAL baseline-sequential JPEG decoder (the MJPEG intra-frame
    * shape): marker walk (DQT/DHT/SOF0/SOS, APPn/COM skipped), general
    * canonical-Huffman entropy decode with byte-stuffing, dequantize,
    * full 2-D float IDCT per block, level shift + clamp. Scope is the
    * single-component (grayscale) 8-bit baseline stream — one 8×8
    * block per MCU; progressive/multi-component/restart streams and
    * any structural violation (truncated segment, undefined table,
    * missing EOI) return null, like every codec here. Decoding is
    * bit-exact for DC-only blocks (integer DC path, power-of-two
    * scaling), which is what makes the MJPEG gate oracle exact.
    */
  def decodeJpeg(p: Array[Byte]): JpegImage = {
    if (!isJpeg(p)) return null
    val quant = Array.ofDim[Int](4, 64) // zigzag order
    val quantSeen = new Array[Boolean](4)
    // huffman tables [class 0=DC,1=AC][id]: decode arrays per T.81 F.2.2.3
    val hMin = Array.ofDim[Array[Int]](2, 4)
    val hMax = Array.ofDim[Array[Int]](2, 4)
    val hPtr = Array.ofDim[Array[Int]](2, 4)
    val hSym = Array.ofDim[Array[Int]](2, 4)
    var width = 0
    var height = 0
    var compQuant = -1
    var dcId = -1
    var acId = -1
    var off = 2
    var sawSof = false
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 4 > p.length || (p(off) & 0xFF) != 0xFF) return null
      val m = p(off + 1) & 0xFF
      val segLen = ((p(off + 2) & 0xFF) << 8) | (p(off + 3) & 0xFF)
      if (segLen < 2 || off + 2 + segLen > p.length) return null
      val segEnd = off + 2 + segLen
      m match {
        case 0xDB => // DQT: one or more tables
          var q = off + 4
          while (q < segEnd) {
            val pq = (p(q) & 0xF0) >> 4
            val tq = p(q) & 0x0F
            // 8-bit tables only; table ids are 0-3 per T.81 B.2.4.1
            if (pq != 0 || tq > 3 || q + 65 > segEnd) return null
            var i = 0
            while (i < 64) { quant(tq)(i) = p(q + 1 + i) & 0xFF; i += 1 }
            quantSeen(tq) = true
            q += 65
          }
        case 0xC4 => // DHT: one or more tables
          var q = off + 4
          while (q < segEnd) {
            val tc = (p(q) & 0xF0) >> 4
            val th = p(q) & 0x0F
            // class 0/1, destination 0-3 (T.81 B.2.4.2)
            if (tc > 1 || th > 3 || q + 17 > segEnd) return null
            val counts = Array.tabulate(16)(i => p(q + 1 + i) & 0xFF)
            val n = counts.sum
            if (n == 0 || q + 17 + n > segEnd) return null
            val syms = Array.tabulate(n)(i => p(q + 17 + i) & 0xFF)
            // per-length min/max code + symbol pointer (T.81 F.2.2.3)
            val mn = Array.fill(17)(0)
            val mx = Array.fill(17)(-1)
            val vp = Array.fill(17)(0)
            var code = 0
            var idx = 0
            var l = 1
            while (l <= 16) {
              if (counts(l - 1) > 0) {
                vp(l) = idx
                mn(l) = code
                mx(l) = code + counts(l - 1) - 1
                code += counts(l - 1)
                idx += counts(l - 1)
              } else mx(l) = -1
              code <<= 1
              l += 1
            }
            hMin(tc)(th) = mn; hMax(tc)(th) = mx; hPtr(tc)(th) = vp; hSym(tc)(th) = syms
            q += 17 + n
          }
        case 0xC0 => // SOF0: baseline sequential (len 8 + 3 per component)
          if (segLen < 11 || (p(off + 4) & 0xFF) != 8) return null
          height = ((p(off + 5) & 0xFF) << 8) | (p(off + 6) & 0xFF)
          width = ((p(off + 7) & 0xFF) << 8) | (p(off + 8) & 0xFF)
          val nComp = p(off + 9) & 0xFF
          if (nComp != 1 || height == 0 || width == 0) return null // grayscale scope
          if ((p(off + 11) & 0xFF) != 0x11) return null // 1x1 sampling
          compQuant = p(off + 12) & 0xFF
          sawSof = true
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
            0xCD | 0xCE | 0xCF =>
          return null // non-baseline frame types out of scope
        case 0xDA => // SOS
          if (!sawSof || segLen < 8 || (p(off + 4) & 0xFF) != 1) return null
          dcId = (p(off + 6) & 0xF0) >> 4
          acId = p(off + 6) & 0x0F
          if (dcId > 3 || acId > 3) return null
          if ((p(off + 7) & 0xFF) != 0 || (p(off + 8) & 0xFF) != 63) return null
          scanStart = segEnd
        case _ => () // APPn / COM / others: skip
      }
      off = segEnd
    }
    if (compQuant < 0 || compQuant > 3 || !quantSeen(compQuant)) return null
    if (hSym(0)(dcId) == null || hSym(1)(acId) == null) return null
    val q = quant(compQuant)

    // entropy-coded scan: MSB-first bit reader with 0xFF00 stuffing
    var pos = scanStart
    var bitBuf = 0
    var bitCnt = 0
    var truncated = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= p.length) { truncated = true; return 0 }
        var b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= p.length) { truncated = true; return 0 }
          val b2 = p(pos) & 0xFF
          if (b2 == 0x00) pos += 1 // stuffed data byte
          else { truncated = true; b = 0 } // a marker inside the scan
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeSym(tc: Int, th: Int): Int = {
      var code = nextBit()
      var l = 1
      val mn = hMin(tc)(th); val mx = hMax(tc)(th); val vp = hPtr(tc)(th)
      while (l <= 16) {
        if (mx(l) >= 0 && code <= mx(l))
          return hSym(tc)(th)(vp(l) + code - mn(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      truncated = true
      0
    }

    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val pixels = new Array[Int](width * height)
    val coef = new Array[Int](64)
    val idctTmp = new Array[Double](64)
    var pred = 0
    var blk = 0
    while (blk < bx * by) {
      java.util.Arrays.fill(coef, 0)
      val t = decodeSym(0, dcId)
      if (t > 11) return null
      pred += jpegExtend(receive(t), t)
      coef(0) = pred * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = decodeSym(1, acId)
        if (rs == 0x00) eob = true
        else if (rs == 0xF0) k += 16
        else {
          k += (rs >> 4)
          val s = rs & 0x0F
          if (k > 63) return null
          coef(Zigzag(k)) = jpegExtend(receive(s), s) * q(k)
          k += 1
        }
      }
      if (truncated) return null
      // 2-D IDCT (T.81 A.3.3), separable row-column passes: 2·8·64
      // multiplies per block, with zero-row skip (DC-only blocks — the
      // MJPEG fixture shape — touch only the first row)
      val bxi = blk % bx
      val byi = blk / bx
      var v = 0
      while (v < 8) { // rows of the coefficient block → tmp(v)(x)
        var allZero = true
        var u = 0
        while (u < 8 && allZero) { if (coef(v * 8 + u) != 0) allZero = false; u += 1 }
        var x = 0
        while (x < 8) {
          var acc = 0.0
          if (!allZero) {
            u = 0
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0) acc += DctBasis(u)(x) * f
              u += 1
            }
          }
          idctTmp(v * 8 + x) = acc
          x += 1
        }
        v += 1
      }
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0.0
          v = 0
          while (v < 8) { acc += DctBasis(v)(y) * idctTmp(v * 8 + x); v += 1 }
          val px = bxi * 8 + x
          val py = byi * 8 + y
          if (px < width && py < height) {
            val pv = math.round(acc / 4.0).toInt + 128
            pixels(py * width + px) = math.max(0, math.min(255, pv))
          }
          x += 1
        }
        y += 1
      }
      blk += 1
    }
    // strict tail: residual bits flushed, then EOI (optional FF fill)
    while (pos < p.length && (p(pos) & 0xFF) == 0xFF &&
      pos + 1 < p.length && (p(pos + 1) & 0xFF) == 0xFF) pos += 1
    if (pos + 2 > p.length || (p(pos) & 0xFF) != 0xFF || (p(pos + 1) & 0xFF) != 0xD9)
      return null
    JpegImage(width, height, pixels)
  }

  // fixture-encoder tables: 12 DC categories at 4 bits, all 162
  // standard AC symbols at 8 bits — valid canonical tables (the
  // decoder reads whatever DHT declares, so simple beats Annex K)
  private val EncDcCounts: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcSyms: Array[Int] = (0 to 11).toArray
  private val EncAcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAcSyms: Array[Int] =
    (0x00 +: 0xF0 +: (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val EncQ = 8 // uniform quant: DC path exact (8·(v-128)/8 integer)

  /** Baseline grayscale JPEG encoder — the MJPEG fixture generator
    * (real forward DCT, quantization, run-length + canonical-Huffman
    * entropy coding), kept next to the other payload encoders. Dims
    * must be multiples of 8. Constant-valued 8×8 blocks survive the
    * round trip bit-exact (DC-only, uniform q=8), which the MJPEG gate
    * fixture exploits; arbitrary content round-trips within the usual
    * quantization error.
    */
  def jpegEncodeGray(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "jpegEncodeGray: dims must be positive multiples of 8")
    require(width <= 0xFFFF && height <= 0xFFFF,
      "jpegEncodeGray: SOF0 dims are 16-bit — split larger content across frames")
    require(pixels.length == width * height, "jpegEncodeGray: dims must cover pixels")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xDB, 0x00 +: Array.fill(64)(EncQ)) // DQT table 0, zigzag
    seg(0xC0, Array(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF,
      1, 1, 0x11, 0)) // SOF0: gray, 1x1 sampling, quant 0
    seg(0xC4, ((0x00 +: EncDcCounts.toSeq) ++ EncDcSyms.toSeq).toArray)
    seg(0xC4, ((0x10 +: EncAcCounts.toSeq) ++ EncAcSyms.toSeq).toArray)
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcCodes = huffCanonical(EncDcCounts, EncDcSyms.length)
    val acCodes = huffCanonical(EncAcCounts, EncAcSyms.length)
    val acIdx = EncAcSyms.zipWithIndex.toMap
    var bitBuf = 0L
    var bitCnt = 0
    def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1))
      bitCnt += len
      while (bitCnt >= 8) {
        val b = ((bitBuf >> (bitCnt - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        bitCnt -= 8
      }
    }
    def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    val f = new Array[Double](64)
    val fTmp = new Array[Double](64)
    val zz = new Array[Int](64)
    var pred = 0
    val bx = width / 8
    val by = height / 8
    var blk = 0
    while (blk < bx * by) {
      val x0 = (blk % bx) * 8
      val y0 = (blk / bx) * 8
      // forward DCT (T.81 A.3.3) over the level-shifted block,
      // separable row-column passes (2·8·64 multiplies per block)
      var y = 0
      while (y < 8) { // rows → t(y,u)
        var u = 0
        while (u < 8) {
          var acc = 0.0
          var x = 0
          while (x < 8) {
            acc += (pixels((y0 + y) * width + x0 + x) - 128) * DctBasis(u)(x)
            x += 1
          }
          fTmp(y * 8 + u) = acc
          u += 1
        }
        y += 1
      }
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0.0
          y = 0
          while (y < 8) { acc += fTmp(y * 8 + u) * DctBasis(v)(y); y += 1 }
          f(v * 8 + u) = acc / 4.0
          u += 1
        }
        v += 1
      }
      var k = 0
      while (k < 64) { zz(k) = math.round(f(Zigzag(k)) / EncQ).toInt; k += 1 }
      val diff = zz(0) - pred
      pred = zz(0)
      val t = category(diff)
      val (dcCode, dcLen) = dcCodes(t)
      putBits(dcCode, dcLen)
      if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      var lastNz = 63
      while (lastNz > 0 && zz(lastNz) == 0) lastNz -= 1
      k = 1
      var run = 0
      while (k <= lastNz) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) {
            val (c, l) = acCodes(acIdx(0xF0)); putBits(c, l); run -= 16
          }
          val s = category(zz(k))
          val (c, l) = acCodes(acIdx((run << 4) | s))
          putBits(c, l)
          putBits(if (zz(k) < 0) zz(k) + (1 << s) - 1 else zz(k), s)
          run = 0
        }
        k += 1
      }
      if (lastNz < 63) { val (c, l) = acCodes(acIdx(0x00)); putBits(c, l) } // EOB
      blk += 1
    }
    if (bitCnt > 0) putBits(0xFF, 8 - bitCnt) // pad with 1s
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ---- color (multi-component) baseline JPEG ----------------------------

  /** Decoded color surface: dims + row-major 0..255 R/G/B planes. */
  final case class JpegColorImage(
      width: Int, height: Int, r: Array[Int], g: Array[Int], b: Array[Int])

  /** JFIF YCbCr→RGB in 16.16 fixed point — libjpeg's constants
    * (1.402, 0.344136, 0.714136, 1.772 scaled by 2^16). Integer-only
    * so the mm5 oracle can mirror the transform verbatim in SQL
    * (`>> 16` on non-negative products; the gate fixtures keep
    * Cb,Cr >= 128 so no sign-dependent shift semantics are in play —
    * the decoder itself handles either sign via floorDiv).
    */
  private val CrR = 91881   // round(1.402    * 65536)
  private val CbG = 22554   // round(0.344136 * 65536)
  private val CrG = 46802   // round(0.714136 * 65536)
  private val CbB = 116130  // round(1.772    * 65536)

  private def clamp255(v: Int): Int = math.max(0, math.min(255, v))

  /** YCbCr → (r, g, b), fixed-point with floor semantics. */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp255(y + Math.floorDiv(CrR * (cr - 128), 65536)),
    clamp255(y - Math.floorDiv(CbG * (cb - 128) + CrG * (cr - 128), 65536)),
    clamp255(y + Math.floorDiv(CbB * (cb - 128), 65536)))

  /** General baseline-sequential JPEG decoder, 1 or 3 components with
    * sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0 and
    * grayscale), per-component quant/Huffman table bindings,
    * interleaved MCUs, DRI/RSTn restart intervals, nearest-neighbor
    * chroma upsample and the fixed-point JFIF color transform above.
    * The round-9 extension of [[decodeJpeg]] (which stays the
    * MJPEG-gate-pinned single-component path, untouched): real image
    * corpora are 3-component YCbCr, usually 4:2:0. Contract is
    * unchanged — any structural violation (non-baseline frame,
    * sampling beyond 2, undefined table, truncated scan, missing
    * restart marker, missing EOI) returns null, never a guess.
    * Uniform DC-only MCUs decode bit-exactly (the same integer DC
    * path as the gray decoder), which is what the mm5 color gate
    * pins.
    */
  def decodeJpegColor(p: Array[Byte]): JpegColorImage = {
    if (!isJpeg(p)) return null
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val hMin = Array.ofDim[Array[Int]](2, 4)
    val hMax = Array.ofDim[Array[Int]](2, 4)
    val hPtr = Array.ofDim[Array[Int]](2, 4)
    val hSym = Array.ofDim[Array[Int]](2, 4)
    var width = 0
    var height = 0
    var nComp = 0
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compQ = new Array[Int](3)
    val compId = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var restartInterval = 0
    var off = 2
    var sawSof = false
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 4 > p.length || (p(off) & 0xFF) != 0xFF) return null
      val m = p(off + 1) & 0xFF
      val segLen = ((p(off + 2) & 0xFF) << 8) | (p(off + 3) & 0xFF)
      if (segLen < 2 || off + 2 + segLen > p.length) return null
      val segEnd = off + 2 + segLen
      m match {
        case 0xDB =>
          var q = off + 4
          while (q < segEnd) {
            val pq = (p(q) & 0xF0) >> 4
            val tq = p(q) & 0x0F
            if (pq != 0 || tq > 3 || q + 65 > segEnd) return null
            var i = 0
            while (i < 64) { quant(tq)(i) = p(q + 1 + i) & 0xFF; i += 1 }
            quantSeen(tq) = true
            q += 65
          }
        case 0xC4 =>
          var q = off + 4
          while (q < segEnd) {
            val tc = (p(q) & 0xF0) >> 4
            val th = p(q) & 0x0F
            if (tc > 1 || th > 3 || q + 17 > segEnd) return null
            val counts = Array.tabulate(16)(i => p(q + 1 + i) & 0xFF)
            val n = counts.sum
            if (n == 0 || q + 17 + n > segEnd) return null
            val syms = Array.tabulate(n)(i => p(q + 17 + i) & 0xFF)
            val mn = Array.fill(17)(0)
            val mx = Array.fill(17)(-1)
            val vp = Array.fill(17)(0)
            var code = 0
            var idx = 0
            var l = 1
            while (l <= 16) {
              if (counts(l - 1) > 0) {
                vp(l) = idx; mn(l) = code; mx(l) = code + counts(l - 1) - 1
                code += counts(l - 1); idx += counts(l - 1)
              } else mx(l) = -1
              code <<= 1
              l += 1
            }
            hMin(tc)(th) = mn; hMax(tc)(th) = mx; hPtr(tc)(th) = vp; hSym(tc)(th) = syms
            q += 17 + n
          }
        case 0xDD => // DRI
          if (segLen != 4) return null
          restartInterval = ((p(off + 4) & 0xFF) << 8) | (p(off + 5) & 0xFF)
        case 0xC0 =>
          if (segLen < 8 || (p(off + 4) & 0xFF) != 8) return null
          height = ((p(off + 5) & 0xFF) << 8) | (p(off + 6) & 0xFF)
          width = ((p(off + 7) & 0xFF) << 8) | (p(off + 8) & 0xFF)
          nComp = p(off + 9) & 0xFF
          if ((nComp != 1 && nComp != 3) || height == 0 || width == 0) return null
          if (segLen < 8 + 3 * nComp) return null
          var ci = 0
          while (ci < nComp) {
            compId(ci) = p(off + 10 + 3 * ci) & 0xFF
            val hv = p(off + 11 + 3 * ci) & 0xFF
            compH(ci) = (hv & 0xF0) >> 4
            compV(ci) = hv & 0x0F
            compQ(ci) = p(off + 12 + 3 * ci) & 0xFF
            if (compH(ci) < 1 || compH(ci) > 2 || compV(ci) < 1 || compV(ci) > 2 ||
              compQ(ci) > 3) return null
            ci += 1
          }
          sawSof = true
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
            0xCD | 0xCE | 0xCF =>
          return null
        case 0xDA =>
          if (!sawSof || segLen < 6 + 2 * nComp || (p(off + 4) & 0xFF) != nComp)
            return null
          var si = 0
          while (si < nComp) {
            val scanId = p(off + 5 + 2 * si) & 0xFF
            val ci = compId.indexOf(scanId)
            if (ci < 0 || ci >= nComp) return null
            compDc(ci) = (p(off + 6 + 2 * si) & 0xF0) >> 4
            compAc(ci) = p(off + 6 + 2 * si) & 0x0F
            if (compDc(ci) > 3 || compAc(ci) > 3) return null
            si += 1
          }
          val ssOff = off + 5 + 2 * nComp
          if ((p(ssOff) & 0xFF) != 0 || (p(ssOff + 1) & 0xFF) != 63) return null
          scanStart = segEnd
        case _ => ()
      }
      off = segEnd
    }
    var ci = 0
    while (ci < nComp) {
      if (!quantSeen(compQ(ci))) return null
      if (hSym(0)(compDc(ci)) == null || hSym(1)(compAc(ci)) == null) return null
      ci += 1
    }
    val hmx = (0 until nComp).map(compH(_)).max
    val vmx = (0 until nComp).map(compV(_)).max
    val mcusX = (width + 8 * hmx - 1) / (8 * hmx)
    val mcusY = (height + 8 * vmx - 1) / (8 * vmx)
    // per-component padded planes (block-aligned)
    val planeW = Array.tabulate(nComp)(i => mcusX * compH(i) * 8)
    val planeH = Array.tabulate(nComp)(i => mcusY * compV(i) * 8)
    val planes = Array.tabulate(nComp)(i => new Array[Int](planeW(i) * planeH(i)))

    var pos = scanStart
    var bitBuf = 0
    var bitCnt = 0
    var truncated = false
    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= p.length) { truncated = true; return 0 }
        var b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= p.length) { truncated = true; return 0 }
          val b2 = p(pos) & 0xFF
          if (b2 == 0x00) pos += 1
          else { truncated = true; b = 0 }
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeSym(tc: Int, th: Int): Int = {
      var code = nextBit()
      var l = 1
      val mn = hMin(tc)(th); val mx = hMax(tc)(th); val vp = hPtr(tc)(th)
      while (l <= 16) {
        if (mx(l) >= 0 && code <= mx(l))
          return hSym(tc)(th)(vp(l) + code - mn(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      truncated = true
      0
    }

    val preds = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val idctTmp = new Array[Double](64)
    var restN = 0 // expected RSTn modulus
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      // restart boundary: byte-align, consume RSTn, reset predictors
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bitCnt = 0
        if (pos + 2 > p.length || (p(pos) & 0xFF) != 0xFF ||
          (p(pos + 1) & 0xFF) != (0xD0 + restN)) return null
        pos += 2
        restN = (restN + 1) & 7
        java.util.Arrays.fill(preds, 0)
      }
      val mx0 = mcu % mcusX
      val my0 = mcu / mcusX
      ci = 0
      while (ci < nComp) {
        val q = quant(compQ(ci))
        var bv = 0
        while (bv < compV(ci)) {
          var bh = 0
          while (bh < compH(ci)) {
            java.util.Arrays.fill(coef, 0)
            val t = decodeSym(0, compDc(ci))
            if (t > 11) return null
            preds(ci) += jpegExtend(receive(t), t)
            coef(0) = preds(ci) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeSym(1, compAc(ci))
              if (rs == 0x00) eob = true
              else if (rs == 0xF0) k += 16
              else {
                k += (rs >> 4)
                val s = rs & 0x0F
                if (k > 63) return null
                coef(Zigzag(k)) = jpegExtend(receive(s), s) * q(k)
                k += 1
              }
            }
            if (truncated) return null
            // 2-D IDCT into the component plane (same math as the
            // gray path — DC-only blocks are integer-exact)
            var v = 0
            while (v < 8) {
              var allZero = true
              var u = 0
              while (u < 8 && allZero) { if (coef(v * 8 + u) != 0) allZero = false; u += 1 }
              var x = 0
              while (x < 8) {
                var acc = 0.0
                if (!allZero) {
                  u = 0
                  while (u < 8) {
                    val fc = coef(v * 8 + u)
                    if (fc != 0) acc += DctBasis(u)(x) * fc
                    u += 1
                  }
                }
                idctTmp(v * 8 + x) = acc
                x += 1
              }
              v += 1
            }
            val px0 = (mx0 * compH(ci) + bh) * 8
            val py0 = (my0 * compV(ci) + bv) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0
                v = 0
                while (v < 8) { acc += DctBasis(v)(y) * idctTmp(v * 8 + x); v += 1 }
                val pv = math.round(acc / 4.0).toInt + 128
                planes(ci)((py0 + y) * planeW(ci) + px0 + x) = clamp255(pv)
                x += 1
              }
              y += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // strict tail: EOI after optional FF fill
    while (pos < p.length && (p(pos) & 0xFF) == 0xFF &&
      pos + 1 < p.length && (p(pos + 1) & 0xFF) == 0xFF) pos += 1
    if (pos + 2 > p.length || (p(pos) & 0xFF) != 0xFF || (p(pos + 1) & 0xFF) != 0xD9)
      return null

    // upsample (nearest) + color transform into RGB planes
    val r = new Array[Int](width * height)
    val g = new Array[Int](width * height)
    val b = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = y * width + x
        if (nComp == 1) {
          val yv = planes(0)(y * planeW(0) + x)
          r(i) = yv; g(i) = yv; b(i) = yv
        } else {
          def sample(c: Int): Int = {
            val sx = x * compH(c) / hmx
            val sy = y * compV(c) / vmx
            planes(c)(sy * planeW(c) + sx)
          }
          val (rv, gv, bv) = ycbcrToRgb(sample(0), sample(1), sample(2))
          r(i) = rv; g(i) = gv; b(i) = bv
        }
        x += 1
      }
      y += 1
    }
    JpegColorImage(width, height, r, g, b)
  }

  /** DC-only 4:2:0 color JPEG fixture encoder: one uniform
    * (y, cb, cr) per 16×16 MCU, uniform q=8 — each component's DC
    * path is integer-exact through [[decodeJpegColor]], so fixture
    * color recovery is bit-exact (the jpegEncodeGray exactness
    * argument, per component). Real scan structure: interleaved
    * 4×Y + Cb + Cr blocks per MCU, differential DC per component,
    * canonical Huffman, byte stuffing.
    */
  def jpegEncodeColor420(
      colors: Array[(Int, Int, Int)], mcusX: Int, mcusY: Int): Array[Byte] = {
    require(mcusX > 0 && mcusY > 0 && colors.length == mcusX * mcusY,
      "jpegEncodeColor420: one (y,cb,cr) triple per MCU")
    require(mcusX * 16 <= 0xFFFF && mcusY * 16 <= 0xFFFF,
      "jpegEncodeColor420: SOF0 dims are 16-bit")
    require(colors.forall { case (a, c, d) =>
      a >= 0 && a <= 255 && c >= 0 && c <= 255 && d >= 0 && d <= 255 },
      "jpegEncodeColor420: components must be 0..255")
    val width = mcusX * 16
    val height = mcusY * 16
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8)
    seg(0xDB, 0x00 +: Array.fill(64)(EncQ))
    seg(0xC0, Array(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF,
      3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // Y 2x2, Cb 1x1, Cr 1x1
    seg(0xC4, ((0x00 +: EncDcCounts.toSeq) ++ EncDcSyms.toSeq).toArray)
    seg(0xC4, ((0x10 +: EncAcCounts.toSeq) ++ EncAcSyms.toSeq).toArray)
    seg(0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dcCodes = huffCanonical(EncDcCounts, EncDcSyms.length)
    val acCodes = huffCanonical(EncAcCounts, EncAcSyms.length)
    val acIdx = EncAcSyms.zipWithIndex.toMap
    var bitBuf = 0L
    var bitCnt = 0
    def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1))
      bitCnt += len
      while (bitCnt >= 8) {
        val bb = ((bitBuf >> (bitCnt - 8)) & 0xFF).toInt
        out.write(bb)
        if (bb == 0xFF) out.write(0x00)
        bitCnt -= 8
      }
    }
    def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putDcOnlyBlock(dcValue: Int, pred: Int): Int = {
      val diff = dcValue - pred
      val t = category(diff)
      val (dcCode, dcLen) = dcCodes(t)
      putBits(dcCode, dcLen)
      if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      val (c, l) = acCodes(acIdx(0x00)) // EOB: DC-only
      putBits(c, l)
      dcValue
    }
    var predY = 0
    var predCb = 0
    var predCr = 0
    var i = 0
    while (i < colors.length) {
      val (yv, cbv, crv) = colors(i)
      // uniform block DC after quant (q=8): value - 128, per component
      var blk = 0
      while (blk < 4) { predY = putDcOnlyBlock(yv - 128, predY); blk += 1 }
      predCb = putDcOnlyBlock(cbv - 128, predCb)
      predCr = putDcOnlyBlock(crv - 128, predCr)
      i += 1
    }
    if (bitCnt > 0) putBits(0xFF, 8 - bitCnt)
    marker(0xD9)
    out.toByteArray
  }

  // ---- real AVI container codec (pure JVM, no media libraries) -----------

  /** True iff the payload is a RIFF/AVI container whose declared size
    * matches the byte count — strict like [[isWav]]/[[isBmp]], so text
    * payloads can never misroute into the demuxer.
    */
  def isAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      tag(payload, 0) == "RIFF" && tag(payload, 8) == "AVI " &&
      leInt(payload, 4) == payload.length - 8

  /** Decoded AVI surface: container-declared frame count, demuxed
    * frame count, and the 8-bin byte-class histogram over all frame
    * payload bytes.
    */
  final case class AviInfo(declaredFrames: Int, frames: Int, bins: Array[Double])

  /** REAL demux path for AVI payloads: walks the top-level RIFF chunk
    * list, reads `dwTotalFrames` from the `avih` main header inside
    * LIST/hdrl, then iterates the `00db`/`00dc` frame chunks inside
    * LIST/movi (word-aligned, arbitrary interleaved chunks skipped)
    * and histograms frame content into 8 classes. Frame chunks carrying
    * a JPEG stream (SOI signature) take the REAL MJPEG intra-frame
    * path — [[decodeJpeg]] per chunk, histogram over decoded pixels
    * (`(p >> 4) & 7`); raw frame chunks histogram their bytes (`b & 7`)
    * as before. Returns null on structural violation (truncated chunk,
    * missing hdrl/avih/movi, declared-vs-demuxed frame count mismatch,
    * malformed JPEG frame).
    */
  def decodeAvi(payload: Array[Byte]): AviInfo = {
    if (!isAvi(payload)) return null
    var declared = -1
    var frames = 0
    val bins = new Array[Double](8)
    var nBytes = 0L
    var off = 12
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val sz = leInt(payload, off + 4)
      if (sz < 0 || off + 8 + sz > payload.length) return null // truncated chunk
      if (id == "LIST" && sz >= 4) {
        val listType = tag(payload, off + 8)
        if (listType == "hdrl") {
          // sub-chunks of hdrl: find avih (56-byte MainAVIHeader)
          var p = off + 12
          val end = off + 8 + sz
          while (p + 8 <= end) {
            val cid = tag(payload, p)
            val csz = leInt(payload, p + 4)
            if (csz < 0 || p + 8 + csz > end) return null
            if (cid == "avih") {
              if (csz < 20) return null
              declared = leInt(payload, p + 8 + 16) // dwTotalFrames
            }
            p += 8 + csz + (csz & 1)
          }
        } else if (listType == "movi") {
          var p = off + 12
          val end = off + 8 + sz
          while (p + 8 <= end) {
            val cid = tag(payload, p)
            val csz = leInt(payload, p + 4)
            if (csz < 0 || p + 8 + csz > end) return null
            if (cid.endsWith("db") || cid.endsWith("dc")) {
              frames += 1
              if (csz >= 4 && (payload(p + 8) & 0xFF) == 0xFF &&
                (payload(p + 9) & 0xFF) == 0xD8) {
                // MJPEG frame chunk: REAL intra-frame bitstream decode —
                // the histogram is over decoded PIXELS (class = bits 4-6,
                // the fixture's value layout), not frame bytes
                val img = decodeJpeg(
                  java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + csz))
                if (img == null) return null // structural violation
                var i = 0
                while (i < img.pixels.length) {
                  bins((img.pixels(i) >> 4) & 7) += 1.0
                  nBytes += 1
                  i += 1
                }
              } else {
                var i = 0
                while (i < csz) {
                  bins(payload(p + 8 + i) & 7) += 1.0
                  nBytes += 1
                  i += 1
                }
              }
            }
            p += 8 + csz + (csz & 1)
          }
        }
      }
      off += 8 + sz + (sz & 1)
    }
    if (declared < 0 || frames != declared) return null
    AviInfo(declared, frames, bins.map(_ / math.max(nBytes, 1L).toDouble))
  }

  /** Per-frame content histograms from an AVI payload: the same RIFF
    * walk and violation contract as [[decodeAvi]], but each frame
    * keeps its OWN 8-class histogram (raw frames by `byte & 7`, MJPEG
    * frames by decoded-pixel class) — the temporal view scene-cut
    * detection needs, which the aggregate decode collapses. Null on
    * any structural violation.
    */
  def decodeAviFrameHists(payload: Array[Byte]): Array[Array[Long]] = {
    if (!isAvi(payload)) return null
    var declared = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    var off = 12
    while (off + 8 <= payload.length) {
      val id = tag(payload, off)
      val sz = leInt(payload, off + 4)
      if (sz < 0 || off + 8 + sz > payload.length) return null // truncated chunk
      if (id == "LIST" && sz >= 4) {
        val listType = tag(payload, off + 8)
        if (listType == "hdrl") {
          var p = off + 12
          val end = off + 8 + sz
          while (p + 8 <= end) {
            val cid = tag(payload, p)
            val csz = leInt(payload, p + 4)
            if (csz < 0 || p + 8 + csz > end) return null
            if (cid == "avih") {
              if (csz < 20) return null
              declared = leInt(payload, p + 8 + 16)
            }
            p += 8 + csz + (csz & 1)
          }
        } else if (listType == "movi") {
          var p = off + 12
          val end = off + 8 + sz
          while (p + 8 <= end) {
            val cid = tag(payload, p)
            val csz = leInt(payload, p + 4)
            if (csz < 0 || p + 8 + csz > end) return null
            if (cid.endsWith("db") || cid.endsWith("dc")) {
              val bins = new Array[Long](8)
              if (csz >= 4 && (payload(p + 8) & 0xFF) == 0xFF &&
                (payload(p + 9) & 0xFF) == 0xD8) {
                val img = decodeJpeg(
                  java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + csz))
                if (img == null) return null
                var i = 0
                while (i < img.pixels.length) {
                  bins((img.pixels(i) >> 4) & 7) += 1L
                  i += 1
                }
              } else {
                var i = 0
                while (i < csz) {
                  bins(payload(p + 8 + i) & 7) += 1L
                  i += 1
                }
              }
              out += bins
            }
            p += 8 + csz + (csz & 1)
          }
        }
      }
      off += 8 + sz + (sz & 1)
    }
    if (declared < 0 || out.length != declared) return null
    out.toArray
  }

  private val sceneCutSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_cuts", LongType, nullable = false),
    StructField("max_l1_milli", LongType, nullable = false),
    StructField("first_cut_frame", LongType, nullable = true)))

  /** Scene-cut detection over DECODED AVI frames (round-9 mm7): the
    * L1 distance between consecutive frames' content histograms,
    * normalized by the two frames' mass, flags a boundary when it
    * exceeds `tMilli`/1000 (integer cross-multiplication:
    * `l1·1000 > tMilli·(mass_prev + mass_cur)`). The shot-boundary
    * pass a video pipeline runs before sampling one frame per scene
    * (mm2's stride sampling is the blind alternative). All exact
    * integers from the per-frame histograms, so the oracle recomputes
    * the verdict from the fixture's deterministic frame chunking.
    * Rows whose payload fails the strict AVI walk are dropped.
    *
    * Scale shape: demux + decode + the consecutive-pair fold run
    * partition-local per clip; one narrow row out per clip.
    */
  def sceneCuts(media: DataFrame, tMilli: Long = 500L): DataFrame = {
    require(tMilli >= 1 && tMilli <= 1000, "sceneCuts: tMilli in [1, 1000]")
    val enc = org.apache.spark.sql.Encoders.row(sceneCutSchema)
    media.select("media_id", "payload").mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val hists = decodeAviFrameHists(r.getAs[Array[Byte]]("payload"))
        if (hists == null) None
        else {
          var nCuts = 0L
          var maxMilli = 0L
          var firstCut = -1L
          var f = 1
          while (f < hists.length) {
            var l1 = 0L
            var mass = 0L
            var c = 0
            while (c < 8) {
              l1 += math.abs(hists(f)(c) - hists(f - 1)(c))
              mass += hists(f)(c) + hists(f - 1)(c)
              c += 1
            }
            val milli = if (mass > 0) l1 * 1000 / mass else 0L
            if (milli > maxMilli) maxMilli = milli
            if (l1 * 1000 > tMilli * mass && mass > 0) {
              nCuts += 1
              if (firstCut < 0) firstCut = f
            }
            f += 1
          }
          Some(Row(r.getLong(0), hists.length.toLong, nCuts, maxMilli,
            if (firstCut < 0) null else java.lang.Long.valueOf(firstCut)))
        }
      }
    }(enc)
  }

  /** Build a minimal valid AVI container around raw frame payloads:
    * RIFF("AVI ") { LIST(hdrl){ avih }, LIST(movi){ 00db… } } — the
    * synthetic payload generator for video-kind media.
    */
  def aviEncode(frames: Array[Array[Byte]]): Array[Byte] =
    aviEncode(frames, "00db")

  /** [[aviEncode]] with an explicit frame chunk id — `00dc`
    * (compressed) for MJPEG frame payloads, `00db` for raw.
    */
  def aviEncode(frames: Array[Array[Byte]], chunkId: String): Array[Byte] = {
    require(chunkId.length == 4, "aviEncode: chunk id must be 4 bytes")
    val moviData = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlSize = 4 + 8 + 56       // "hdrl" + avih chunk
    val moviSize = 4 + moviData     // "movi" + frame chunks
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(total - 8).put("AVI ".getBytes)
    buf.put("LIST".getBytes).putInt(hdrlSize).put("hdrl".getBytes)
    buf.put("avih".getBytes).putInt(56)
    buf.putInt(33333).putInt(0).putInt(0).putInt(0) // usec/frame, maxbps, pad, flags
    buf.putInt(frames.length)                       // dwTotalFrames
    buf.putInt(0).putInt(1).putInt(0)               // initial, streams, bufsize
    buf.putInt(64).putInt(64)                       // width, height
    buf.putInt(0).putInt(0).putInt(0).putInt(0)     // reserved
    buf.put("LIST".getBytes).putInt(moviSize).put("movi".getBytes)
    frames.foreach { f =>
      buf.put(chunkId.getBytes).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte) // word align
    }
    buf.array()
  }

  /** Build a minimal valid 24-bit BMP (one padded pixel row per image
    * row, grayscale: all three channels = the given value) — the
    * synthetic payload generator for image-kind media.
    */
  def bmpEncode(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width * height == pixels.length, "bmpEncode: dims must cover pixels")
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataLen = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel-array offset
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1) // planes
      .putShort(24) // bpp
      .putInt(0) // BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < height) {
      val rowStart = 54 + r * rowSize
      var x = 0
      while (x < width) {
        val v = pixels(r * width + x)
        buf.put(rowStart + 3 * x, v).put(rowStart + 3 * x + 1, v)
          .put(rowStart + 3 * x + 2, v)
        x += 1
      }
      r += 1
    }
    buf.array()
  }

  /** Build a minimal valid WAV file (PCM mono 16-bit) around the given
    * samples — the synthetic payload generator for audio-kind media.
    */
  def wavEncode(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Partition-local decode/feature-extract stage. Batch-shaped: the
    * iterator is consumed lazily per partition (constant memory), rows
    * with null payloads produce null features (not dropped — the
    * metadata row survives for audit). Dispatch is by CONTENT, not the
    * `kind` tag: a structurally valid WAV/BMP/AVI payload takes the
    * matching real decoder path (header walk → samples/pixels/frames →
    * feature); everything else falls to the documented [[stubDecode]]
    * boundary.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { it: Iterator[Row] =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val nBytes = if (payload == null) 0 else payload.length
        val feature = dispatchRoute(payload) match {
          case "wav" => decodeWav(payload)
          case "bmp" => decodeBmp(payload)
          case "png" => decodePng(payload)
          case "jpeg" =>
            val img = decodeJpeg(payload)
            if (img == null) null
            else {
              val bins = new Array[Double](8)
              img.pixels.foreach(px => bins((px >> 4) & 7) += 1.0)
              bins.map(_ / math.max(img.pixels.length, 1).toDouble)
            }
          case "avi" =>
            val info = decodeAvi(payload)
            if (info == null) null else info.bins
          case _ => stubDecode(r.getString(1), payload)
        }
        Row(r.getLong(0), r.getString(1), nBytes, feature)
      }
    }(enc)
  }

  /** Decoder route [[decodeFeatures]] takes for a payload — the SINGLE
    * source of truth for content dispatch (decodeFeatures matches on
    * this string), so the audit below can never drift from the real
    * dispatch. "stub" is the documented [[stubDecode]] `???` boundary;
    * "null" is the null-payload pass-through (feature stays null).
    */
  def dispatchRoute(payload: Array[Byte]): String =
    if (payload == null) "null"
    else if (isWav(payload)) "wav"
    else if (isBmp(payload)) "bmp"
    else if (isPng(payload)) "png"
    else if (isJpeg(payload)) "jpeg"
    else if (isAvi(payload)) "avi"
    else "stub"

  /** Dispatch-route audit (r14 verdict task 5 — fence the stub
    * boundary): counts payloads of a `(src, kind, payload)` frame by
    * the decoder route [[decodeFeatures]] would take. Gate entry
    * `mm10_dispatch_audit` runs it over EVERY gated media fixture
    * family and pins the counts to a pure doc_id/text function the
    * oracle mirrors — in particular the absence of any `stub` row: no
    * gated fixture may silently fall through to [[stubDecode]].
    */
  def dispatchAudit(media: DataFrame): DataFrame = {
    val auditSchema = StructType(Seq(
      StructField("src", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("route", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(auditSchema)
    media.select("src", "kind", "payload").mapPartitions { it: Iterator[Row] =>
      it.map(r => Row(r.getString(0), r.getString(1),
        dispatchRoute(r.getAs[Array[Byte]]("payload"))))
    }(enc).groupBy("src", "kind", "route")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
  }

  private val colorStatsSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType), StructField("n_px", LongType)))

  /** Per-image integer color mass from DECODED color-JPEG pixels
    * (round-9 mm5): sum of each RGB plane plus the pixel count —
    * integer-exact, so the oracle can recompute it from the fixture
    * text. Rows whose payload is null or fails the strict decode are
    * dropped (the codec contract: a violation is a null, never a
    * guess). Partition-local decode, one narrow row out per image —
    * the 100 TB shape is the same as decodeFeatures: codec work rides
    * the input's own partitioning, nothing shuffles but the result.
    */
  def colorStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(colorStatsSchema)
    media.select("media_id", "payload").mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img = if (isJpeg(payload)) decodeJpegColor(payload) else null
        if (img == null) None
        else {
          var sr = 0L
          var sg = 0L
          var sb = 0L
          var i = 0
          val n = img.width * img.height
          while (i < n) { sr += img.r(i); sg += img.g(i); sb += img.b(i); i += 1 }
          Some(Row(r.getLong(0), sr, sg, sb, n.toLong))
        }
      }
    }(enc)
  }

  private val audioSegSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_samples", LongType), StructField("n_frames", LongType),
    StructField("n_silent", LongType), StructField("max_frame_energy", LongType),
    StructField("longest_silent_run", LongType), StructField("total_energy", LongType)))

  /** Audio loudness / silence segmentation over DECODED PCM (round-9
    * mm6): samples group into fixed `frame`-sample windows (the tail
    * window may be shorter); a frame is SILENT when its absolute-
    * amplitude sum is zero. The report per clip — frame count, silent
    * count, loudest frame, longest silent RUN, total energy — is the
    * pre-transcription triage every audio pipeline runs (skip dead
    * air, route the loud clips to VAD), all exact integers so the
    * oracle recomputes it from the fixture construction. Rows whose
    * payload is not a structurally valid PCM WAV are dropped (the
    * codec contract: violations are nulls, never guesses).
    *
    * Scale shape: decode + the single segmentation pass run
    * partition-local on the input's own partitioning; one narrow row
    * out per clip, nothing shuffles but the result.
    */
  def audioSegments(media: DataFrame, frame: Int = 4): DataFrame = {
    require(frame >= 1 && frame <= 65536, "audioSegments: frame in [1, 65536]")
    val enc = org.apache.spark.sql.Encoders.row(audioSegSchema)
    media.select("media_id", "payload").mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val samples = decodeWavSamples(r.getAs[Array[Byte]]("payload"))
        if (samples == null) None
        else {
          val n = samples.length
          var i = 0
          var frameEnergy = 0L
          var total = 0L
          var nFrames = 0L
          var nSilent = 0L
          var maxEnergy = 0L
          var run = 0L
          var maxRun = 0L
          def closeFrame(): Unit = {
            nFrames += 1
            if (frameEnergy > maxEnergy) maxEnergy = frameEnergy
            if (frameEnergy == 0L) {
              nSilent += 1; run += 1
              if (run > maxRun) maxRun = run
            } else run = 0L
            frameEnergy = 0L
          }
          while (i < n) {
            frameEnergy += math.abs(samples(i))
            total += math.abs(samples(i))
            i += 1
            if (i % frame == 0) closeFrame()
          }
          if (n % frame != 0) closeFrame() // short tail window
          Some(Row(r.getLong(0), n.toLong, nFrames, nSilent, maxEnergy,
            maxRun, total))
        }
      }
    }(enc)
  }

  /** Frame sampling for video-kind rows: keep every `stride`-th frame
    * index as its own row (frame payload extraction is part of the
    * stubbed codec). Produces the (media_id, frame_idx) exploded shape
    * a caption/embedding stage consumes.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video" && col("n_frames").isNotNull &&
        col("n_frames") > 0) // sequence(0, -1, +step) would throw
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stage contract: records target dims next to the payload;
    * the pixel transform itself lives in the stubbed codec. Keeps the
    * plan a narrow projection.
    */
  def resizePlan(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("target_width", lit(w)).withColumn("target_height", lit(h))
}
