package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** The real WAV codec path: structurally genuine files decode through
  * the RIFF chunk walk; anything malformed falls back (or nulls)
  * rather than being guessed at.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("imageAHash: deterministic bits, identical images group, malformed dropped") {
    import spark.implicits._
    // '0' -> class 0, 'g' -> class 7. "00gg" pixels [0,0,7,7]:
    // 64 floor-spaced samples = 16x{0,0,7,7}, sum 224, bit set iff
    // sample*64 > 224 -> bits 32..63 -> signed hash 0xFFFFFFFF00000000
    val withBmp = Seq((1L, "00gg"), (2L, "00gg"), (3L, "0g0g"))
      .toDF("media_id", "text")
      .select($"media_id",
        graft.testing.MediaFixtures.bmpFromText($"text").as("payload"))
    val media = withBmp.unionByName(
      Seq((4L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
    val out = graft.pipeline.Multimodal.imageAHashGroups(media)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((-4294967296L, 4L, 2L)), out.toString) // 0xFFFFFFFF00000000
    assert(out(2L) === out(1L))                // identical content groups
    assert(out(3L)._1 !== out(1L)._1)          // different layout, new hash
    assert(out(3L)._3 === 1L)
    assert(!out.contains(4L))                  // malformed dropped
  }

  test("sceneCuts: L1 boundary verdict, stable scenes null, malformed dropped") {
    import spark.implicits._
    def frame(cls: Int, n: Int): Array[Byte] = Array.fill(n)(cls.toByte)
    // clip 1: two identical frames then a hard content change:
    // boundary 1 l1=0 (no cut), boundary 2 l1=8/mass=8 -> 1000 milli
    val cut = Multimodal.aviEncode(Array(frame(0, 4), frame(0, 4), frame(7, 4)))
    // clip 2: identical frames throughout: never cuts, first_cut null
    val flat = Multimodal.aviEncode(Array(frame(3, 4), frame(3, 4)))
    val media = Seq((1L, cut), (2L, flat), (3L, Array[Byte](9, 9)))
      .toDF("media_id", "payload")
    val out = Multimodal.sceneCuts(media, tMilli = 500)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4)))).toMap
    assert(out(1L) === ((3L, 1L, 1000L, 2L)), out.toString)
    assert(out(2L) === ((2L, 0L, 0L, null)), out.toString)
    assert(!out.contains(3L))
    intercept[IllegalArgumentException] {
      Multimodal.sceneCuts(media, tMilli = 0)
    }
  }

  test("audioSegments: frame energies, silent runs, tail window, abs amplitude") {
    import spark.implicits._
    // clip 1: [1,0,0,0 | 0,0,0,0 | -2,0,0,0 | 0] -> 4 frames (tail 1),
    // silent at #2 and #4 (non-adjacent: longest run 1), |−2| loudest
    val c1 = Multimodal.wavEncode(
      Array[Short](1, 0, 0, 0, 0, 0, 0, 0, -2, 0, 0, 0, 0))
    // clip 2: 16 zeros then [5]: 4 silent frames in a row, tail loud
    val c2 = Multimodal.wavEncode(Array.fill[Short](16)(0) :+ 5.toShort)
    val media = Seq((1L, c1), (2L, c2), (3L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val out = Multimodal.audioSegments(media, frame = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out(1L) === ((13L, 4L, 2L, 2L, 1L, 3L)), out.toString)
    assert(out(2L) === ((17L, 5L, 4L, 5L, 4L, 5L)), out.toString)
    assert(!out.contains(3L)) // malformed payload dropped, never guessed
    intercept[IllegalArgumentException] {
      Multimodal.audioSegments(media, frame = 0)
    }
  }

  test("wavEncode → decodeWav: header walk + PCM samples → histogram") {
    val samples = Array[Short](0, 1, 1, 7, 7, 7, 2, 2)
    val wav = Multimodal.wavEncode(samples)
    assert(Multimodal.isWav(wav))
    val f = Multimodal.decodeWav(wav)
    assert(f(0) === 1.0 / 8 && f(1) === 2.0 / 8 && f(7) === 3.0 / 8 && f(2) === 2.0 / 8)
    assert(f(3) === 0.0 && f.sum === 1.0)
  }

  test("chunk walk skips unknown chunks (LIST) and still finds fmt/data") {
    val base = Multimodal.wavEncode(Array[Short](5, 5))
    // splice a LIST chunk between fmt and data (offset 36 = end of fmt)
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val f = Multimodal.decodeWav(spliced)
    assert(f != null && f(5) === 1.0)
  }

  test("malformed payloads never reach the WAV path") {
    // plain text, even starting with RIFF, fails the strict size check
    assert(!Multimodal.isWav("RIFF is a container format WAVE".getBytes))
    // truncated file: header claims more data than present -> null
    val wav = Multimodal.wavEncode(Array[Short](1, 2, 3))
    val truncated = wav.take(wav.length - 2)
    assert(!Multimodal.isWav(truncated)) // RIFF size no longer matches
    // stereo/non-PCM rejected: flip audioFormat to 2 (offset 20)
    val nonPcm = wav.clone
    nonPcm(20) = 2
    assert(Multimodal.decodeWav(nonPcm) == null)
  }

  test("bmpEncode → decodeBmp: header parse + padded pixel walk → histogram") {
    // 5 pixels, 1 row: rowSize pads 15 → 16 bytes
    val bmp = Multimodal.bmpEncode(Array[Byte](0, 1, 1, 7, 7), width = 5, height = 1)
    assert(bmp.length === 54 + 16)
    assert(Multimodal.isBmp(bmp))
    val f = Multimodal.decodeBmp(bmp)
    assert(f(0) === 1.0 / 5 && f(1) === 2.0 / 5 && f(7) === 2.0 / 5 && f.sum === 1.0)
    // multi-row: same histogram through the per-row padding walk
    val grid = Multimodal.bmpEncode(Array[Byte](3, 3, 4, 4, 5, 5), width = 2, height = 3)
    val g = Multimodal.decodeBmp(grid)
    assert(g(3) === 2.0 / 6 && g(4) === 2.0 / 6 && g(5) === 2.0 / 6)
  }

  test("malformed payloads never reach the BMP path") {
    // plain text starting with BM fails the strict size check
    assert(!Multimodal.isBmp("BMath is not an image format at all honestly".getBytes))
    val bmp = Multimodal.bmpEncode(Array[Byte](1, 2), width = 2, height = 1)
    assert(!Multimodal.isBmp(bmp.take(bmp.length - 2))) // declared size mismatch
    // 8-bit / compressed variants rejected, not guessed
    val bpp8 = bmp.clone; bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8) == null)
    val rle = bmp.clone; rle(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmp(rle) == null)
    // pixel array overrunning the file rejected
    val overrun = bmp.clone
    java.nio.ByteBuffer.wrap(overrun).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, 99) // height claims 99 rows
    assert(Multimodal.decodeBmp(overrun) == null)
  }

  test("BMP geometry overflow: crafted huge width/height return null, never throw") {
    // widths where 3*width wraps negative in Int made the old Int
    // rowSize pass the length bound and then throw (ADVICE r9); both
    // decoders must honor the null-on-violation contract in Long math
    val base = Multimodal.bmpEncode(Array[Byte](1, 2), width = 2, height = 1)
    def crafted(width: Int, height: Int): Array[Byte] = {
      val b = base.clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(18, width)
      bb.putInt(22, height)
      b
    }
    for (w <- Seq(716000000, Int.MaxValue, Int.MaxValue / 3 + 1);
         h <- Seq(1, -1, Int.MinValue, Int.MaxValue)) {
      assert(Multimodal.decodeBmp(crafted(w, h)) == null, s"decodeBmp w=$w h=$h")
      assert(Multimodal.decodeBmpGray(crafted(w, h)) == null, s"decodeBmpGray w=$w h=$h")
    }
    // height = Int.MinValue alone (abs is still negative) must be rejected
    assert(Multimodal.decodeBmpGray(crafted(2, Int.MinValue)) == null)
    // sanity: the untouched fixture still decodes on both paths
    assert(Multimodal.decodeBmp(base) != null && Multimodal.decodeBmpGray(base) != null)
  }

  test("zero-norm (empty-text) features never reach similarity ranking") {
    // an empty doc decodes to the all-zero feature; its cosine is NaN
    // against everything and row_number(cosine DESC) would rank NaN
    // first — the mm3 composition filters zero-norm rows on both sides
    import spark.implicits._
    import graft.pipeline.Similarity
    val docs = Seq((0L, "abc"), (3L, ""), (6L, "abd"), (9L, "xyz"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val feats = Multimodal.decodeFeatures(graft.testing.MediaFixtures.syntheticMedia(docs))
      .select(col("media_id"), col("feature"))
      .filter(col("feature").isNotNull &&
        exists(col("feature"), v => v =!= lit(0.0)))
    val top = Similarity.bruteForceTopK(feats, feats.filter(col("media_id") < 6),
      "media_id", "feature", 3).collect()
    assert(top.nonEmpty)
    // doc 3 (empty) appears neither as query nor candidate; no NaNs
    assert(!top.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
    assert(!top.exists(r => r.getDouble(2).isNaN))
  }

  test("decodeFeatures dispatches by content: WAV rows decoded, text rows stubbed") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (4L, "abc"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val media = graft.testing.MediaFixtures.syntheticMedia(docs) // id 1 -> audio/WAV, id 4 -> audio too
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("n_bytes"), r.getAs[Seq[Double]]("feature")))).toMap
    // 'a'=97 (&7=1), 'b'=98 (2), 'c'=99 (3): histogram 1/3 each
    val expected = Seq(0.0, 1.0 / 3, 1.0 / 3, 1.0 / 3, 0.0, 0.0, 0.0, 0.0)
    assert(feats(1L)._1 === 44 + 6) // real file size, not text length
    assert(feats(1L)._2 === expected)
    // the same text as a non-WAV payload stubs to the same histogram
    // (stub contract), but with text-length n_bytes
    val textMedia = Seq((9L, "image", "abc".getBytes)).toDF("media_id", "kind", "payload")
    val stubbed = Multimodal.decodeFeatures(textMedia).collect().head
    assert(stubbed.getAs[Int]("n_bytes") === 3)
    assert(stubbed.getAs[Seq[Double]]("feature") === expected)
  }

  test("no gated media fixture reaches the stubDecode boundary (r14 fence)") {
    import spark.implicits._
    // doc ids cover every syntheticMedia dispatch arm (%6 residues
    // 0..5) plus degenerate 1-char text; mjpeg + colorjpeg families
    // run over the same docs — the gated surface's full fixture space
    val docs = (0L to 11L).map(i => (i, if (i % 4 == 3) "x" else s"doc $i text ©"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val m = graft.testing.MediaFixtures
    val cols = Seq(col("media_id"), col("kind"), col("payload"))
    val all = m.syntheticMedia(docs).select(cols: _*)
      .withColumn("src", lit("synthetic"))
      .unionByName(m.mjpegMedia(docs).select(cols: _*)
        .withColumn("src", lit("mjpeg")))
      .unionByName(m.colorJpegMedia(docs).select(cols: _*)
        .withColumn("src", lit("colorjpeg")))
    val routes = Multimodal.dispatchAudit(all).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(!routes.keySet.exists(_._3 == "stub"),
      s"gated fixture fell through to stubDecode: $routes")
    assert(!routes.keySet.exists(_._3 == "null"),
      s"gated fixture produced a null payload for non-null text: $routes")
    // and each family lands on exactly the codec its arm promises
    assert(routes.keySet.filter(_._1 == "mjpeg").map(_._3) === Set("avi"))
    assert(routes.keySet.filter(_._1 == "colorjpeg").map(_._3) === Set("jpeg"))
    assert(routes.keySet.filter(_._1 == "synthetic").map(_._3) ===
      Set("wav", "bmp", "png", "avi"))
  }

  test("stubDecode: feature is an L1-normalized codepoint histogram") {
    // The stub's published contract (Multimodal.scala stubDecode doc):
    // an 8-bin codepoint histogram normalized by TOTAL codepoints, so
    // features are payload-length-invariant. Pins the denominator
    // (kills the h090 max->min denominator mutant: unnormalized bins
    // for n >= 2, NaN for the empty payload).
    val f = Multimodal.stubDecode("opaque", "abcdefgh".getBytes("UTF-8"))
    assert(math.abs(f.sum - 1.0) < 1e-12, s"histogram not L1-normalized: ${f.toSeq}")
    assert(f.forall(v => v >= 0.0 && v <= 1.0))
    // empty payload: guarded denominator -> all-zero feature, never NaN
    val e = Multimodal.stubDecode("opaque", Array.emptyByteArray)
    assert(e.forall(_ == 0.0), s"empty payload must yield zeros: ${e.toSeq}")
  }

  test("aviEncode → decodeAvi: RIFF demux — hdrl/avih frame count + movi frame walk") {
    // three frames, one odd-length (word-align pad exercised)
    val avi = Multimodal.aviEncode(Array(
      Array[Byte](0, 1), Array[Byte](1, 7, 7), Array[Byte](2)))
    assert(Multimodal.isAvi(avi))
    val info = Multimodal.decodeAvi(avi)
    assert(info.declaredFrames === 3 && info.frames === 3)
    // bytes: 0,1,1,7,7,2 → bins over 6
    assert(info.bins(0) === 1.0 / 6 && info.bins(1) === 2.0 / 6 &&
      info.bins(2) === 1.0 / 6 && info.bins(7) === 2.0 / 6)
    // zero-length frames still count as frames (empty-text containers)
    val empty = Multimodal.aviEncode(Array(Array.empty[Byte]))
    val e = Multimodal.decodeAvi(empty)
    assert(e.frames === 1 && e.bins.forall(_ === 0.0))
  }

  test("malformed payloads never reach the AVI path") {
    // plain text starting with RIFF fails the strict size check
    assert(!Multimodal.isAvi("RIFF but actually just prose, sorry".getBytes))
    val avi = Multimodal.aviEncode(Array(Array[Byte](1, 2)))
    assert(!Multimodal.isAvi(avi.take(avi.length - 2))) // declared size mismatch
    // declared-vs-demuxed frame count mismatch rejected, not guessed:
    // patch dwTotalFrames (hdrl at 12, avih data at 12+12+8, +16)
    val lied = avi.clone
    java.nio.ByteBuffer.wrap(lied).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 12 + 8 + 16, 5)
    assert(Multimodal.decodeAvi(lied) == null)
    // truncated inner chunk (frame claims more bytes than movi holds)
    val torn = avi.clone
    java.nio.ByteBuffer.wrap(torn).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(avi.length - 2 - 4, 1 << 20) // 00db size field
    assert(Multimodal.decodeAvi(torn) == null)
  }

  test("decodeFeatures routes video rows through the real AVI demux") {
    import spark.implicits._
    // doc_id % 3 == 2 → video; n_chars=3 → 4 frames around 3 bytes
    val docs = Seq((2L, "abc")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val row = Multimodal.decodeFeatures(graft.testing.MediaFixtures.syntheticMedia(docs)).collect().head
    // container size: 100 + 8*4 + 3 + odd(3 frames of 1 byte) = 138
    assert(row.getAs[String]("kind") === "video")
    assert(row.getAs[Int]("n_bytes") === 100 + 32 + 3 + 3)
    // histogram equals the codepoint-class histogram: a,b,c → bins 1,2,3
    val f = row.getSeq[Double](row.fieldIndex("feature"))
    assert(f(1) === 1.0 / 3 && f(2) === 1.0 / 3 && f(3) === 1.0 / 3)
  }

  test("pngEncode → decodePng: chunk walk, inflate, unfilter → histogram") {
    val png = Multimodal.pngEncode(Array[Byte](0, 1, 1, 7, 7), width = 5, height = 1)
    // stored-block closed form for n×1: 64 + n + 5·ceil((n+1)/65535)
    assert(png.length === 64 + 5 + 5)
    assert(Multimodal.isPng(png))
    val f = Multimodal.decodePng(png)
    assert(f(0) === 1.0 / 5 && f(1) === 2.0 / 5 && f(7) === 2.0 / 5 && f.sum === 1.0)
  }

  test("all five scanline filters reverse losslessly") {
    // multi-row image so Up/Average/Paeth reference a real prior row
    val pixels = Array.tabulate[Byte](24)(i => ((i * 37 + 5) % 256).toByte)
    val expected = Multimodal.decodePng(
      Multimodal.pngEncode(pixels, width = 6, height = 4, filterType = 0))
    for (ft <- 1 to 4) {
      val g = Multimodal.decodePng(
        Multimodal.pngEncode(pixels, width = 6, height = 4, filterType = ft))
      assert(g.toSeq === expected.toSeq, s"filter $ft")
    }
    // Paeth tie-break order is part of the PNG spec (mutations g035/
    // g036/g040/g041): these pixels put BOTH value-differing tie
    // patterns in the predictor context — (a,b,c)=(13,7,9) has
    // pa==pc (spec picks a over c) and (12,6,10) has pb==pc (picks b
    // over c). A single-side tie flip (encoder or decoder) breaks the
    // round-trip; the provably-equivalent pa==pb tie (forces a==b)
    // has no such pixels because none exist.
    val tiePx = Array[Byte](9, 7, 10, 6, 13, 25, 12, 30)
    val tieExpected = Multimodal.decodePng(
      Multimodal.pngEncode(tiePx, width = 4, height = 2, filterType = 0))
    val tiePaeth = Multimodal.decodePng(
      Multimodal.pngEncode(tiePx, width = 4, height = 2, filterType = 4))
    assert(tiePaeth.toSeq === tieExpected.toSeq, "paeth tie round-trip")
  }

  test("decodePng handles genuinely COMPRESSED deflate and truecolor RGB") {
    // hand-build an RGB PNG with a Deflater-compressed zlib stream —
    // proves the decoder is not specialized to our stored-block encoder
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      val tb = typ.getBytes("US-ASCII")
      b.putInt(data.length).put(tb).put(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      b.putInt(crc.getValue.toInt).array()
    }
    val w = 3; val h = 2
    // RGB pixels; first channel (R) drives the histogram: 0,1,2 / 3,4,5
    val rgb = Array[Byte](0, 9, 9, 1, 9, 9, 2, 9, 9, 3, 9, 9, 4, 9, 9, 5, 9, 9)
    val raw = new Array[Byte]((3 * w + 1) * h)
    for (r <- 0 until h) {
      raw(r * (3 * w + 1)) = 0
      System.arraycopy(rgb, r * 3 * w, raw, r * (3 * w + 1) + 1, 3 * w)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = defl.deflate(zbuf); defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.take(zlen)) ++
      chunk("IEND", Array.emptyByteArray)
    val f = Multimodal.decodePng(png)
    assert((0 to 5).forall(k => f(k) === 1.0 / 6) && f(6) === 0.0 && f(7) === 0.0)
  }

  test("malformed payloads never reach the PNG path") {
    val png = Multimodal.pngEncode(Array[Byte](1, 2, 3), width = 3, height = 1)
    // corrupted pixel data (inside IDAT) → CRC mismatch → rejected
    val bad = png.clone; bad(49) = (bad(49) ^ 0x55).toByte
    assert(Multimodal.decodePng(bad) == null)
    // truncated stream rejected
    assert(Multimodal.decodePng(png.take(png.length - 1)) == null)
    // interlaced / 16-bit / palette images rejected, not guessed
    def flipIhdr(off: Int, v: Byte): Array[Byte] = {
      val c = png.clone; c(off) = v
      // re-sign IHDR so the failure is the FIELD, not the CRC
      val crc = new java.util.zip.CRC32(); crc.update(c, 12, 17)
      java.nio.ByteBuffer.wrap(c).putInt(29, crc.getValue.toInt); c
    }
    assert(Multimodal.decodePng(flipIhdr(24, 16.toByte)) == null) // bit depth 16
    assert(Multimodal.decodePng(flipIhdr(25, 3.toByte)) == null) // palette
    assert(Multimodal.decodePng(flipIhdr(28, 1.toByte)) == null) // Adam7
  }

  test("decodeFeatures routes image rows through BMP and PNG by id parity") {
    import spark.implicits._
    // doc_id%6==0 → BMP, doc_id%6==3 → PNG; same text → same histogram
    val docs = Seq((0L, "abc"), (3L, "abc")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val rows = Multimodal.decodeFeatures(graft.testing.MediaFixtures.syntheticMedia(docs))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getAs[Int]("n_bytes") === 54 + 12) // 3·3=9 pads to 12
    assert(rows(1).getAs[Int]("n_bytes") === 64 + 3 + 5)
    val fb = rows(0).getSeq[Double](rows(0).fieldIndex("feature"))
    val fp = rows(1).getSeq[Double](rows(1).fieldIndex("feature"))
    assert(fb.toSeq === fp.toSeq)
    assert(fp(1) === 1.0 / 3 && fp(2) === 1.0 / 3 && fp(3) === 1.0 / 3)
  }

  test("jpegEncodeGray → decodeJpeg: constant blocks round-trip BIT-EXACT") {
    // one constant 8×8 block per value — DC-only under uniform q=8
    val vals = Array(8, 24, 56, 120, 72)
    val px = new Array[Int](64 * vals.length)
    vals.zipWithIndex.foreach { case (v, b) =>
      java.util.Arrays.fill(px, b * 64, (b + 1) * 64, v)
    }
    val jpg = Multimodal.jpegEncodeGray(px, 8, 8 * vals.length)
    assert(Multimodal.isJpeg(jpg))
    val img = Multimodal.decodeJpeg(jpg)
    assert(img != null && img.width === 8 && img.height === 8 * vals.length)
    assert(img.pixels.toSeq === px.toSeq, "DC-only decode must be exact")
  }

  test("decodeJpeg survives real AC coefficients (gradient within quant error)") {
    // a gradient block exercises the AC run-length + huffman + IDCT path
    val px = Array.tabulate(64)(i => (i % 8) * 30 + (i / 8) * 2)
    val img = Multimodal.decodeJpeg(Multimodal.jpegEncodeGray(px, 8, 8))
    assert(img != null)
    val maxErr = img.pixels.zip(px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 16, s"AC round-trip error $maxErr exceeds quantization bound")
  }

  test("jpeg AC TAIL coefficient survives encoding (mutation g043)") {
    // a pure (7,7)-basis block (pixels = round(128 + 100·b7(x)·b7(y))):
    // its quantized spectrum is EXACTLY {(7,7): 13} — one AC
    // coefficient, sitting at zigzag position 63, the LAST nonzero.
    // An encoder whose run-length walk stops before lastNz
    // (k <= lastNz flipped strict) drops it entirely and the decoded
    // block collapses to flat DC. The gradient test above cannot see
    // this (its per-pixel quant bound absorbs one tail coefficient).
    val px = Array(
      129, 125, 132, 123, 133, 124, 131, 127, 125, 136, 116, 142, 114, 140, 120, 131,
      132, 116, 145, 108, 148, 111, 140, 124, 123, 142, 108, 152, 104, 148, 114, 133,
      133, 114, 148, 104, 152, 108, 142, 123, 124, 140, 111, 148, 108, 145, 116, 132,
      131, 120, 140, 114, 142, 116, 136, 125, 127, 131, 124, 133, 123, 132, 125, 129)
    val img = Multimodal.decodeJpeg(Multimodal.jpegEncodeGray(px, 8, 8))
    assert(img != null)
    val spread = img.pixels.max - img.pixels.min
    assert(spread >= 30,
      s"(7,7)-basis spread $spread collapsed — tail AC coefficient lost in encoding")
  }

  test("malformed payloads never reach the JPEG decode path") {
    val good = Multimodal.jpegEncodeGray(Array.fill(64)(40), 8, 8)
    assert(Multimodal.decodeJpeg(good) != null)
    assert(Multimodal.decodeJpeg(null) == null)
    assert(Multimodal.decodeJpeg("plain text".getBytes) == null)
    // truncated mid-scan
    assert(Multimodal.decodeJpeg(java.util.Arrays.copyOf(good, good.length - 4)) == null)
    // missing EOI
    val noEoi = good.clone(); noEoi(noEoi.length - 1) = 0x00
    assert(Multimodal.decodeJpeg(noEoi) == null)
    // progressive SOF2 frames are out of baseline scope
    val sof2 = good.clone()
    val sofAt = (0 until sof2.length - 1).find(i =>
      (sof2(i) & 0xFF) == 0xFF && (sof2(i + 1) & 0xFF) == 0xC0).get
    sof2(sofAt + 1) = 0xC2.toByte
    assert(Multimodal.decodeJpeg(sof2) == null)
  }

  test("all container decoders survive adversarial bytes (seeded fuzz)") {
    val rnd = new scala.util.Random(424242L)
    val wav = Multimodal.wavEncode(Array.tabulate(100)(i => (i * 7).toShort))
    val bmp = Multimodal.bmpEncode(Array.tabulate(12)(_.toByte), 12, 1)
    val png = Multimodal.pngEncode(Array.tabulate(12)(_.toByte), 12, 1)
    val avi = Multimodal.aviEncode(Array(Array.tabulate(9)(_.toByte)))
    def fuzzOne(good: Array[Byte], decode: Array[Byte] => Any): Unit = {
      (0 until 200).foreach { _ =>
        val mut = good.clone()
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
        decode(mut) // must not throw
      }
      (0 until good.length).foreach(n => decode(java.util.Arrays.copyOf(good, n)))
    }
    fuzzOne(wav, Multimodal.decodeWav)
    fuzzOne(bmp, Multimodal.decodeBmp)
    fuzzOne(bmp, Multimodal.decodeBmpGray)
    fuzzOne(png, Multimodal.decodePng)
    fuzzOne(avi, Multimodal.decodeAvi)
    // sanity: originals still decode
    assert(Multimodal.decodeWav(wav) != null && Multimodal.decodeBmp(bmp) != null)
    assert(Multimodal.decodePng(png) != null && Multimodal.decodeAvi(avi) != null)
  }

  test("decodeJpeg never throws on adversarial bytes (seeded fuzz)") {
    val good = Multimodal.jpegEncodeGray(Array.tabulate(64)(i => i * 3), 8, 8)
    val rnd = new scala.util.Random(20260813L)
    // random byte blobs behind a forged SOI, and random single-byte
    // corruptions of a valid stream — must return null or an image,
    // never throw (the codec runs inside executor tasks)
    (0 until 300).foreach { _ =>
      val blob = new Array[Byte](rnd.nextInt(200) + 4)
      rnd.nextBytes(blob)
      blob(0) = 0xFF.toByte; blob(1) = 0xD8.toByte
      Multimodal.decodeJpeg(blob) // result unconstrained; absence of throw is the assertion
    }
    (0 until 300).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeJpeg(mut)
    }
    // truncations at every length
    (0 until good.length).foreach { n =>
      Multimodal.decodeJpeg(java.util.Arrays.copyOf(good, n))
    }
    assert(Multimodal.decodeJpeg(good) != null, "the uncorrupted stream still decodes")
  }

  test("jpegEncodeColor420 → decodeJpegColor: DC-only MCUs round-trip BIT-EXACT") {
    val rnd = new scala.util.Random(99L)
    val colors = Array.tabulate(6)(_ =>
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val payload = Multimodal.jpegEncodeColor420(colors, 3, 2)
    val img = Multimodal.decodeJpegColor(payload)
    assert(img != null && img.width === 48 && img.height === 32)
    // every pixel of each 16x16 MCU must equal the fixed-point
    // transform of that MCU's (y,cb,cr) — chroma upsample included
    for (py <- 0 until 32; px <- 0 until 48) {
      val mcu = (py / 16) * 3 + (px / 16)
      val (y, cb, cr) = colors(mcu)
      val (er, eg, eb) = Multimodal.ycbcrToRgb(y, cb, cr)
      val i = py * 48 + px
      assert((img.r(i), img.g(i), img.b(i)) === ((er, eg, eb)),
        s"pixel ($px,$py) mcu $mcu color ($y,$cb,$cr)")
    }
  }

  test("decodeJpegColor decodes grayscale streams identically to decodeJpeg") {
    val px = Array.tabulate(128)(i => (i * 5) % 256)
    val payload = Multimodal.jpegEncodeGray(px, 8, 16)
    val gray = Multimodal.decodeJpeg(payload)
    val color = Multimodal.decodeJpegColor(payload)
    assert(gray != null && color != null)
    assert(color.r.toSeq === gray.pixels.toSeq)
    assert(color.g.toSeq === gray.pixels.toSeq && color.b.toSeq === gray.pixels.toSeq)
  }

  test("decodeJpegColor: DRI segment parses; missing restart marker → null") {
    val payload = Multimodal.jpegEncodeColor420(Array((120, 130, 140)), 1, 1)
    // splice a DRI(0) segment right after SOI: interval 0 = no restarts
    val dri = Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    val spliced = payload.take(2) ++ dri ++ payload.drop(2)
    assert(Multimodal.decodeJpegColor(spliced) != null)
    // a nonzero interval without RSTn markers in the scan must refuse
    val dri1 = Array(0xFF, 0xDD, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val spliced1 = Multimodal.jpegEncodeColor420(
      Array((120, 130, 140), (60, 180, 150)), 2, 1).take(2) ++ dri1 ++
      Multimodal.jpegEncodeColor420(Array((120, 130, 140), (60, 180, 150)), 2, 1).drop(2)
    assert(Multimodal.decodeJpegColor(spliced1) == null)
  }

  test("decodeJpegColor never throws on adversarial bytes (seeded fuzz)") {
    val good = Multimodal.jpegEncodeColor420(
      Array((100, 140, 150), (200, 130, 160), (50, 160, 130), (255, 128, 128)), 2, 2)
    val rnd = new scala.util.Random(20260814L)
    (0 until 300).foreach { _ =>
      val blob = new Array[Byte](rnd.nextInt(200) + 4)
      rnd.nextBytes(blob)
      blob(0) = 0xFF.toByte; blob(1) = 0xD8.toByte
      Multimodal.decodeJpegColor(blob)
    }
    (0 until 300).foreach { _ =>
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeJpegColor(mut)
    }
    (0 until good.length).foreach { n =>
      Multimodal.decodeJpegColor(java.util.Arrays.copyOf(good, n))
    }
    assert(Multimodal.decodeJpegColor(good) != null)
  }

  test("colorStats over the color fixture equals the per-codepoint formula") {
    import spark.implicits._
    val docs = Seq((1L, "Ab"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val media = graft.testing.MediaFixtures.colorJpegMedia(docs)
    val out = Multimodal.colorStats(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // empty/null text rows produce no payload → dropped
    assert(out.keySet === Set(1L))
    def rgbOf(cp: Int) = Multimodal.ycbcrToRgb(
      (cp & 7) * 16 + 64, 128 + ((cp >> 3) & 3) * 16, 128 + ((cp >> 5) & 3) * 16)
    val expect = Seq('A'.toInt, 'b'.toInt).map(rgbOf)
    assert(out(1L)._1 === 256L * expect.map(_._1).sum)
    assert(out(1L)._2 === 256L * expect.map(_._2).sum)
    assert(out(1L)._3 === 256L * expect.map(_._3).sum)
    assert(out(1L)._4 === 512L)
  }

  test("decodeAvi takes the MJPEG intra-frame path for 00dc JPEG chunks") {
    // two frames: classes (1,2) and (3,) — pixel histogram = class shares
    def frame(classes: Array[Int]): Array[Byte] = {
      val px = new Array[Int](64 * classes.length)
      classes.zipWithIndex.foreach { case (c, b) =>
        java.util.Arrays.fill(px, b * 64, (b + 1) * 64, (c << 4) | 8)
      }
      Multimodal.jpegEncodeGray(px, 8, 8 * classes.length)
    }
    val avi = Multimodal.aviEncode(Array(frame(Array(1, 2)), frame(Array(3))), "00dc")
    val info = Multimodal.decodeAvi(avi)
    assert(info != null && info.declaredFrames === 2 && info.frames === 2)
    assert(info.bins(1) === 1.0 / 3 && info.bins(2) === 1.0 / 3 && info.bins(3) === 1.0 / 3)
    assert(info.bins(0) === 0.0)
    // a corrupt JPEG frame is a structural violation of the whole container
    val bad = avi.clone()
    // flip a byte inside the first frame's entropy data (after headers)
    bad(140) = (bad(140) ^ 0x55).toByte
    // either decode fails (null) or decodes to different pixels — never crashes
    val r = Multimodal.decodeAvi(bad)
    assert(r == null || r.bins.sum > 0.0)
  }

  test("mjpegMedia gate fixture: decoded pixel shares equal codepoint-class shares") {
    import spark.implicits._
    val docs = Seq((2L, "abcdefgh"), (5L, ""), (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .withColumn("n_chars", coalesce(length(col("text")), lit(0)))
    val rows = Multimodal.decodeFeatures(graft.testing.MediaFixtures.mjpegMedia(docs))
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 3)
    val f2 = rows(0).getSeq[Double](rows(0).fieldIndex("feature"))
    // "abcdefgh": codepoints 97..104 → classes 1,2,3,4,5,6,7,0 — each 1/8
    assert((0 to 7).forall(k => f2(k) === 1.0 / 8))
    val f5 = rows(1).getSeq[Double](rows(1).fieldIndex("feature"))
    assert(f5.toSeq === Seq.fill(8)(0.0), "empty text → empty frames → zero bins")
    assert(rows(2).isNullAt(rows(2).fieldIndex("feature")), "null text → null feature")
  }
}
