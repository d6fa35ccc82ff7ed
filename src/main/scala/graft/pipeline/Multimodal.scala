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
  * zlib INFLATE, all five scanline filters) and [[decodeAvi]]
  * (RIFF/AVI demux). Media *bitstream* codecs (JPEG/H.264 etc.) are
  * not available in this build environment, so payloads that match
  * none of the container signatures fall to a deterministic stub
  * kernel ([[stubDecode]]) — the Spark-side contract (schema, batch
  * shape, partitioning, null handling) is real and tested; swapping in
  * a real bitstream decoder is a one-function change.
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

  /** REAL decode path for WAV payloads: walks the RIFF chunk list
    * (arbitrary chunk order, skips unknown chunks — LIST/fact/etc.),
    * validates PCM 16-bit from the `fmt ` chunk, then histograms the
    * decoded samples into 8 amplitude-class bins (`sample & 7`,
    * normalized by sample count). Returns null on any structural
    * violation (truncated chunk, non-PCM, missing fmt/data) — the
    * caller decides the fallback, nothing is silently guessed.
    */
  def decodeWav(payload: Array[Byte]): Array[Double] = {
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
    val bins = new Array[Double](8)
    var i = 0
    while (i < n) {
      val sample = (leShort(payload, dataOff + 2 * i) << 16) >> 16 // sign-extend
      bins(sample & 7) += 1.0
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
    if (width < 0 || dataOff < 54) return null
    val rows = math.abs(height)
    val rowSize = ((3 * width + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOff.toLong + rowSize.toLong * rows > payload.length) return null
    val bins = new Array[Double](8)
    var r = 0
    while (r < rows) {
      var x = 0
      while (x < width) {
        bins(payload(dataOff + r * rowSize + 3 * x) & 7) += 1.0
        x += 1
      }
      r += 1
    }
    val n = width.toLong * rows
    bins.map(_ / math.max(n, 1L).toDouble)
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
    * and histograms the frame bytes into 8 classes. The codec DECODES
    * THE CONTAINER, not a video bitstream — frame payloads are treated
    * as raw bytes (the synthetic frames are uncompressed by
    * construction; a real decoder slots in per frame chunk). Returns
    * null on structural violation (truncated chunk, missing
    * hdrl/avih/movi, declared-vs-demuxed frame count mismatch).
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
              var i = 0
              while (i < csz) {
                bins(payload(p + 8 + i) & 7) += 1.0
                nBytes += 1
                i += 1
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

  /** Build a minimal valid AVI container around raw frame payloads:
    * RIFF("AVI ") { LIST(hdrl){ avih }, LIST(movi){ 00db… } } — the
    * synthetic payload generator for video-kind media.
    */
  def aviEncode(frames: Array[Array[Byte]]): Array[Byte] = {
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
      buf.put("00db".getBytes).putInt(f.length).put(f)
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
        val feature =
          if (isWav(payload)) decodeWav(payload)
          else if (isBmp(payload)) decodeBmp(payload)
          else if (isPng(payload)) decodePng(payload)
          else if (isAvi(payload)) {
            val info = decodeAvi(payload)
            if (info == null) null else info.bins
          } else stubDecode(r.getString(1), payload)
        Row(r.getLong(0), r.getString(1), nBytes, feature)
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
