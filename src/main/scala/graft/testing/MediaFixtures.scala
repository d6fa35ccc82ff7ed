package graft.testing

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Synthetic media-payload builders — FIXTURES, not pipeline
  * operators. They fabricate structurally genuine container files
  * (PCM WAV, 24-bit BMP, 8-bit grayscale PNG, RIFF/AVI) whose content
  * derives deterministically from document text, so the REAL decoders
  * in [[graft.pipeline.Multimodal]] get exercised end-to-end while the
  * extracted features stay SQL-expressible for the DuckDB oracle.
  *
  * Scala UDFs are acceptable here precisely because these are
  * synthetic-input builders for tests and gate rows: they never run in
  * a production plan, so codegen friendliness does not apply. Keeping
  * them in the `testing` package keeps the pipeline's main operator
  * sources UDF-free.
  */
object MediaFixtures {

  /** text → real WAV payload whose PCM samples are the text's
    * codepoint classes (`cp & 7`): synthetic CONTENT but a structurally
    * genuine file, so `Multimodal.decodeFeatures` exercises the real
    * header walk + sample decode.
    */
  val wavFromText = udf((text: String) => {
    if (text == null) null
    else {
      val samples = Array.newBuilder[Short]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        samples += (cp & 7).toShort
        i += Character.charCount(cp)
      }
      Multimodal.wavEncode(samples.result())
    }
  })

  /** (text, nFrames) → real AVI payload: the text's codepoint classes
    * (`cp & 7`, one byte each) chunked into exactly `nFrames` frame
    * chunks (first `n % k` frames one byte longer — deterministic
    * split, SQL-expressible container size). Same contract as
    * [[wavFromText]]: synthetic CONTENT, structurally genuine
    * container, so `decodeFeatures` exercises the real RIFF demux.
    */
  val aviFromText = udf((text: String, nFrames: Int) => {
    if (text == null) null
    else {
      val bytes = Array.newBuilder[Byte]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        bytes += (cp & 7).toByte
        i += Character.charCount(cp)
      }
      val b = bytes.result()
      val k = math.max(nFrames, 1)
      val base = b.length / k
      val rem = b.length % k
      var off = 0
      val frames = Array.tabulate(k) { f =>
        val len = base + (if (f < rem) 1 else 0)
        val fr = java.util.Arrays.copyOfRange(b, off, off + len)
        off += len
        fr
      }
      Multimodal.aviEncode(frames)
    }
  })

  /** text → real BMP payload: one grayscale pixel per codepoint (value
    * = `cp & 7`, a single n×1 pixel row) — synthetic CONTENT,
    * structurally genuine file, so `decodeFeatures` exercises the real
    * header parse + pixel walk.
    */
  val bmpFromText = udf((text: String) => {
    if (text == null) null
    else {
      val pixels = Array.newBuilder[Byte]
      var i = 0
      var n = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        pixels += (cp & 7).toByte
        n += 1
        i += Character.charCount(cp)
      }
      Multimodal.bmpEncode(pixels.result(), n, if (n == 0) 0 else 1)
    }
  })

  /** text → real PNG payload, [[bmpFromText]]'s twin for the other
    * half of the image-kind rows (gray = cp & 7, n×1, filter 0, stored
    * deflate blocks so `n_bytes` stays SQL-expressible).
    */
  val pngFromText = udf((text: String) => {
    if (text == null) null
    else {
      val pixels = Array.newBuilder[Byte]
      var i = 0
      var n = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        pixels += (cp & 7).toByte
        n += 1
        i += Character.charCount(cp)
      }
      Multimodal.pngEncode(pixels.result(), n, 1)
    }
  })

  /** (text, nFrames) → real MJPEG-in-AVI payload: the text's
    * codepoints chunked into `nFrames` frame chunks like
    * [[aviFromText]], but each frame is a REAL baseline JPEG — one
    * constant-valued 8×8 block per codepoint (gray value
    * `((cp & 7) << 4) | 8`, image 8×(8·L)), emitted as `00dc` chunks so
    * `Multimodal.decodeAvi` takes the [[Multimodal.decodeJpeg]]
    * intra-frame path. Constant blocks are DC-only under the uniform
    * q=8 table, so the decode is BIT-EXACT and the pixel-class
    * histogram `(p >> 4) & 7` recovers exactly the codepoint classes —
    * the SQL-expressible oracle (same value expression as the raw-AVI
    * row).
    */
  val mjpegAviFromText = udf((text: String, nFrames: Int) => {
    if (text == null) null
    else {
      val classes = Array.newBuilder[Int]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        classes += (cp & 7)
        i += Character.charCount(cp)
      }
      val cs = classes.result()
      val k = math.max(nFrames, 1)
      val base = cs.length / k
      val rem = cs.length % k
      var off = 0
      val frames = Array.tabulate(k) { f =>
        val len = base + (if (f < rem) 1 else 0)
        val fr =
          if (len == 0) Array.emptyByteArray // empty frame chunk: no pixels
          else {
            val px = new Array[Int](64 * len)
            var b = 0
            while (b < len) {
              val v = (cs(off + b) << 4) | 8
              java.util.Arrays.fill(px, b * 64, (b + 1) * 64, v)
              b += 1
            }
            Multimodal.jpegEncodeGray(px, 8, 8 * len)
          }
        off += len
        fr
      }
      Multimodal.aviEncode(frames, "00dc")
    }
  })

  /** Video-kind media frame whose payloads are MJPEG-in-AVI — the
    * decoded-pixels gate input ([[syntheticMedia]]'s video rows carry
    * raw-byte frames; these carry real JPEG bitstreams).
    */
  def mjpegMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      lit("video").as("kind"),
      mjpegAviFromText(col("text"),
        (col("n_chars") % 32 + 1).cast("int")).as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("int").as("sample_rate"),
      (col("n_chars") % 32 + 1).cast("int").as("n_frames"))

  /** Deterministic COLOR JPEG per document (round-9 mm5): one 16×16
    * 4:2:0 MCU per codepoint (first 256), uniform
    * (y, cb, cr) = ((cp&7)·16+64, 128+((cp>>3)&3)·16, 128+((cp>>5)&3)·16)
    * — all three components DC-only and integer-exact through
    * [[Multimodal.decodeJpegColor]], so decoded RGB is a pure integer
    * function of the text the oracle mirrors. Chroma >= 128 keeps the
    * fixed-point color transform shift non-negative on both engines.
    */
  val colorJpegFromText = udf((text: String) => {
    if (text == null) null
    else {
      val cps = Array.newBuilder[Int]
      var i = 0
      var n = 0
      while (i < text.length && n < 256) {
        val cp = text.codePointAt(i)
        cps += cp
        i += Character.charCount(cp)
        n += 1
      }
      val cs = cps.result()
      if (cs.isEmpty) null
      else {
        val colors = cs.map(cp =>
          ((cp & 7) * 16 + 64, 128 + ((cp >> 3) & 3) * 16, 128 + ((cp >> 5) & 3) * 16))
        Multimodal.jpegEncodeColor420(colors, cs.length, 1)
      }
    }
  })

  def colorJpegMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      colorJpegFromText(col("text")).as("payload"))

  /** Build a synthetic media frame from the documents table — gives the
    * plumbing a deterministic, driver-data-derived input. All three
    * modalities carry REAL (if synthetic-content) container files:
    * audio-kind rows a PCM WAV, image-kind rows a 24-bit BMP (even
    * ids) or an 8-bit grayscale PNG (odd ids — both real image
    * formats, two different real decoders), video-kind rows a RIFF/AVI
    * container whose frame count matches the `n_frames` metadata
    * column.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio")).otherwise(lit("video")).as("kind"),
      when(col("doc_id") % 3 === 1, wavFromText(col("text")))
        .when(col("doc_id") % 6 === 0, bmpFromText(col("text")))
        .when(col("doc_id") % 6 === 3, pngFromText(col("text")))
        .otherwise(aviFromText(col("text"),
          (col("n_chars") % 32 + 1).cast("int"))).as("payload"),
      when(col("doc_id") % 3 === 0, length(col("text"))).otherwise(lit(null))
        .cast("int").as("width"),
      when(col("doc_id") % 3 === 0, lit(1)).otherwise(lit(null)).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, lit(16000)).otherwise(lit(null)).cast("int").as("sample_rate"),
      when(col("doc_id") % 3 === 2, (col("n_chars") % 32 + 1)).otherwise(lit(null))
        .cast("int").as("n_frames"))
}
