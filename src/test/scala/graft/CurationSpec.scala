package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.pipeline.Curation

/** Corpus curation: benchmark decontamination, PII redaction,
  * deterministic sampling, sequence packing.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contaminationOverlap flags only docs sharing an n-gram with the benchmark") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro text then the quick brown fox jumps over and more"), // contains a bench 5-gram
      (11L, "completely unrelated words about spark and scala engines"),
      (12L, "fox jumps over the lazy dog said someone once")            // contains another
    ).toDF("doc_id", "text")
    val hits = Curation.contaminationOverlap(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet === Set(10L, 12L))
    assert(hits.values.forall(_ >= 1L))
    val clean = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(11L))
  }

  test("bloomDecontaminate: no false negatives; survivors subset of exact decontaminate") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro text then the quick brown fox jumps over and more"),
      (11L, "completely unrelated words about spark and scala engines"),
      (12L, "fox jumps over the lazy dog said someone once"),
      (13L, null.asInstanceOf[String]) // null text must be kept, like the exact path
    ).toDF("doc_id", "text")
    val bloom = Curation.bloomDecontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    val exact = Curation.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    // no false negatives: everything the exact probe drops, bloom drops
    assert(bloom.subsetOf(exact))
    assert(!bloom.contains(10L) && !bloom.contains(12L))
    assert(bloom.contains(13L))
    // at this load factor (dozens of grams in 2^16 bits) no false positives either
    assert(bloom === exact)
  }

  test("bloom bitset: every inserted hash tests positive; k probes all required") {
    import graft.functions.GraftBloom
    val bits = new Array[Long](1 << 10) // 2^16 bits
    val hashes = (0 until 1000).map(i => (i.toLong * 2654435761L) % 1000000007L)
    hashes.foreach(GraftBloom.insert(bits, _, 4))
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes.toArray)
    assert(GraftBloom.anyContains(arr, bits, 4)) // membership
    hashes.foreach { h =>
      val one = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(h))
      assert(GraftBloom.anyContains(one, bits, 4), s"false negative for $h")
    }
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    assert(!GraftBloom.anyContains(empty, bits, 4))
  }

  test("perplexityBuckets: tertile split per language, fluent docs in the head") {
    val weights = (0 until 1024).map(b => (b.toLong * 97L + 13L) % 500L)
    // 9 docs, one language: 19 distinct bigrams each → the mean-NLL
    // scores spread without ties, so all three buckets populate
    val docs = (1L to 9L).map(i =>
      (i, (1 to 20).map(j => s"t${i}w$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.perplexityBuckets(docs, "doc_id", "text", "lang", weights)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nll_milli"), r.getAs[String]("bucket")))).toMap
    assert(out.size === 9)
    // all three buckets populated, and the split is monotone in score:
    // every head score <= every middle score <= every tail score
    val byBucket = out.values.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // no-bigram docs are dropped, not mis-bucketed
    val withEmpty = docs.unionAll(Seq((99L, "solo", "en")).toDF("doc_id", "text", "lang"))
    val out2 = Curation.perplexityBuckets(withEmpty, "doc_id", "text", "lang", weights)
    assert(!out2.collect().exists(_.getAs[Long]("doc_id") == 99L))
  }

  test("tokenBudgetSample: under-budget strata keep everything, rates are deterministic") {
    val docs = (1L to 200L).map { i =>
      val src = if (i % 2 == 0) "big" else "small"
      (i, src, Seq.fill(10)("w").mkString(" ")) // 10 tokens each
    }.toDF("doc_id", "source", "text")
    // big: 100 docs * 10 tok = 1000 tokens, budget 250 → ~25% per-mille gate;
    // small: budget 100000 → far under budget, keeps all 100
    val out = Curation.tokenBudgetSample(docs, "doc_id", "source", "text",
      Map("big" -> 250L, "small" -> 100000L))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") === 100L)
    assert(bySrc("big") > 0L && bySrc("big") < 100L)
    // deterministic: rerun is byte-identical
    val again = Curation.tokenBudgetSample(docs, "doc_id", "source", "text",
      Map("big" -> 250L, "small" -> 100000L))
    assert(out.select("doc_id").as[Long].collect().sorted
      === again.select("doc_id").as[Long].collect().sorted)
  }

  test("PII: emails and phones counted and redacted; email digits don't double-count") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@example.org or +1 555 123 4567 thanks"),
      (2L, "no pii here at all"),
      (3L, "user123@mail.com")  // digits inside the email must not count as a phone
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.emailCount(col("text")).as("e"),
      TextFunctions.phoneCount(col("text")).as("p"),
      TextFunctions.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._1 === 1 && out(1L)._2 === 1)
    assert(out(1L)._3 === "reach me at [EMAIL] or [PHONE] thanks")
    assert(out(2L) === ((0, 0, "no pii here at all")))
    assert(out(3L) === ((1, 0, "[EMAIL]")))
  }

  test("decontaminateStream filters contaminated docs as a narrow streaming filter") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Row](
      Encoders.row(schema), sqlCtx)
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val out = Curation.decontaminateStream(stream.toDF(), bench, "doc_id", "text", n = 5)
    val name = s"decon_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("decon-ckpt").toString)
      .start()
    def r(id: Long, t: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](id, t), schema)
    try {
      stream.addData(
        r(10L, "prefix the quick brown fox jumps over suffix words here"),
        r(11L, "clean document with entirely different content words"))
      q.processAllAvailable()
      stream.addData(r(12L, "another clean one"), r(13L, "fox jumps over the lazy dog again"))
      q.processAllAvailable()
      val kept = spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
      assert(kept === Seq(11L, 12L))
    } finally q.stop()
  }

  test("hashSample is deterministic and roughly at rate") {
    val df = (0L until 2000L).toDF("doc_id")
    val a = df.filter(Curation.hashSample("doc_id", 10)).as[Long].collect().toSet
    val b = df.filter(Curation.hashSample("doc_id", 10)).as[Long].collect().toSet
    assert(a === b) // stable under re-evaluation
    assert(a.size > 100 && a.size < 320, s"rate off: ${a.size}/2000")
  }

  test("shuffleOrder: reproducible, epoch changes the order, positions are 1..n per shard") {
    val df = (0L until 300L).toDF("doc_id")
    def orderOf(epoch: Int): Seq[(Long, Long, Int)] =
      Curation.shuffleOrder(df, "doc_id", epoch, shards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val e1a = orderOf(1)
    assert(e1a === orderOf(1))                 // rerun-stable
    val e2 = orderOf(2)
    assert(e1a !== e2)                         // epoch reshuffles
    assert(e1a.map(_._1).distinct.size === 300)
    // within every shard, positions are exactly 1..count
    e1a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toList)
    }
    // TRUE reshuffle, not a re-slicing of one fixed permutation: some
    // pair sharing a shard in BOTH epochs flips its relative order
    // (the string-suffix epoch hash only adds a constant — it can
    // never flip a pair; this assertion pins the multiplicative mix)
    val m1 = e1a.map(t => t._1 -> ((t._2, t._3))).toMap
    val m2 = e2.map(t => t._1 -> ((t._2, t._3))).toMap
    val flips = for {
      a <- 0L until 300L; b <- (a + 1) until 300L
      if m1(a)._1 == m1(b)._1 && m2(a)._1 == m2(b)._1
      if (m1(a)._2 < m1(b)._2) != (m2(a)._2 < m2(b)._2)
    } yield (a, b)
    assert(flips.nonEmpty, "epoch change must flip some within-shard pair order")
  }

  test("packChunks: per-shard cumulative offsets, chunk = start/ctx, tokens conserved") {
    val docs = (1L to 40L).map(i => (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.packChunks(docs, "doc_id", "text", ctxTokens = 8, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.length === 40)
    // per shard: ordered by id, start_tok is the running sum of prior docs
    out.groupBy(_._2).foreach { case (_, rows) =>
      var expect = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, start, chunk) =>
        assert(start === expect)
        assert(chunk === start / 8)
        expect += n
      }
    }
    // token totals conserved across the packing
    assert(out.map(_._3.toLong).sum ===
      docs.select(sum(TextFunctions.tokenCount(col("text")))).as[Long].head())
  }

  test("upsample: whole copies plus hash-gated extra; sub-100 strata shrink") {
    val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Curation.upsample(docs, "doc_id", "lang",
      Map("en" -> 250, "de" -> 40)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // en docs appear 2 or 3 times with contiguous 1-based copy indexes
    val enCounts = docs.collect().map(_.getLong(0)).filter(_ % 2 == 0)
      .map(id => byDoc.getOrElse(id, Nil).size)
    assert(enCounts.forall(n => n == 2 || n == 3))
    assert(enCounts.count(_ == 3) > 0 && enCounts.count(_ == 2) > 0)
    byDoc.values.foreach(cs => assert(cs === (1 to cs.size)))
    // de at 40%: some docs vanish, survivors appear exactly once
    val deCounts = (1L until 200L by 2).map(id => byDoc.getOrElse(id, Nil).size)
    assert(deCounts.forall(n => n == 0 || n == 1) && deCounts.contains(0))
    // deterministic across runs
    val again = Curation.upsample(docs, "doc_id", "lang",
      Map("en" -> 250, "de" -> 40)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.sortBy(r => (r._1, r._3)).toSeq === again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("curation ops compose on a live stream: redact -> quality filter -> hash sample") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Row](Encoders.row(schema), sqlCtx)
    // every op is a narrow column transform/filter — streaming-safe
    // with no state, no watermark
    // 60 distinct words + a few stopwords: passes every gopher rule
    val good = (1 to 60).map(i => s"word$i").mkString(" ") + " the a and of to"
    val out = stream.toDF()
      .withColumn("text", graft.functions.TextFunctions.redactPii(col("text")))
      .transform(df => Curation.gopherFilter(df, "text"))
      .filter(col("keep"))
      .filter(Curation.hashSample("doc_id", 100)) // pct=100 keeps all
      .select("doc_id", "text")
    val name = s"curation_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cur-ckpt").toString)
      .start()
    try {
      def row(id: Long, t: String): Row =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](id, t), schema)
      stream.addData(
        row(1L, s"$good mail me at a@b.com"),
        row(2L, "too short"))
      q.processAllAvailable()
      val rows = spark.table(name).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.map(_._1).toSeq === Seq(1L)) // doc 2 fails word-count rule
      assert(rows.head._2.contains("[EMAIL]") && !rows.head._2.contains("a@b.com"))
    } finally q.stop()
  }

  test("selectTopByStratum: exact per-stratum cut, ties to lowest id; quantile path agrees on rate") {
    val df = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.8), ("en", 3L, 0.8), ("en", 4L, 0.1), ("en", 5L, 0.2),
      ("de", 6L, 0.5), ("de", 7L, 0.6), ("de", 8L, 0.4), ("de", 9L, 0.3), ("de", 10L, 0.2))
      .toDF("lang", "doc_id", "q")
    val kept = Curation.selectTopByStratum(df, "lang", "q", "doc_id", keepPct = 40)
      .select("doc_id").as[Long].collect().toSet
    // en: top-2 of 5 = {1, 2} (2 beats 3 on id tie); de: {7, 6}
    assert(kept === Set(1L, 2L, 7L, 6L))
    // scale path: approximate threshold keeps at least the exact top set size
    val approx = Curation.selectAboveQuantile(df, "lang", "q", keepPct = 40)
      .select("doc_id").as[Long].collect().toSet
    assert(approx.intersect(Set(1L, 7L)) === Set(1L, 7L)) // the clear winners survive
  }

  test("calibrationReport: exact cells, clamping, integer quantized sums") {
    // [0,1) split into 4 cells of width 0.25; scores outside clamp in
    val df = Seq(
      (0.10, true), (0.10, false),          // cell 0: n=2 pos=1
      (0.30, true),                         // cell 1
      (0.60, true), (0.70, false),          // cell 2
      (-5.0, false),                        // clamps to cell 0
      (9.0, true), (1.0, true))             // clamp to cell 3 (1.0 = hi)
      .toDF("score", "label")
    val got = Curation.calibrationReport(df, "score", "label",
        lo = 0.0, hi = 1.0, buckets = 4, scaleBits = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def q(x: Double) = (x * 1048576.0).toLong
    assert(got(0L) === ((3L, 1L, q(0.10) * 2 + q(-5.0))))
    assert(got(1L) === ((1L, 1L, q(0.30))))
    assert(got(2L) === ((2L, 1L, q(0.60) + q(0.70))))
    assert(got(3L) === ((2L, 2L, q(9.0) + q(1.0))))
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    // totals conserve rows: every clamped score is still counted
    assert(got.values.map(_._1).sum === 8L)
    intercept[IllegalArgumentException] {
      Curation.calibrationReport(df, "score", "label", lo = 1.0, hi = 1.0)
    }
  }

  test("rankEnsemble: histogram ranks == rank() windows incl. ties, keep rule exact") {
    import org.apache.spark.sql.expressions.Window
    // ties in every signal, opposite directions, a doc good at one
    // signal and terrible at another
    val df = Seq(
      (1L, 10L, 3L, 100L), (2L, 10L, 1L, 200L), (3L, 7L, 1L, 200L),
      (4L, 2L, 9L, 50L), (5L, 7L, 2L, 400L), (6L, 12L, 9L, 10L))
      .toDF("doc_id", "q", "p", "ntok")
    val got = Curation.rankEnsemble(df, "doc_id",
        Seq(("q", false), ("p", true), ("ntok", false)), keepPct = 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // reference: plain global rank() windows (the shape the histogram
    // path exists to avoid at scale, bit-equal on any data)
    val ref = df
      .withColumn("r_q", rank().over(Window.orderBy(col("q").desc)).cast("long"))
      .withColumn("r_p", rank().over(Window.orderBy(col("p").asc)).cast("long"))
      .withColumn("r_ntok", rank().over(Window.orderBy(col("ntok").desc)).cast("long"))
      .collect().map { r =>
        val b = r.getLong(4) + r.getLong(5) + r.getLong(6)
        r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6), b, b * 100 <= 6 * 150))
      }.toMap
    assert(got === ref)
    // spot-pin the tie semantics: docs 2 and 3 share p=1 -> both r_p=1;
    // docs 1 and 2 share q=10 -> both r_q=2 (doc 6 is 1st), next rank 4
    assert(got(2L)._2 === 1L && got(3L)._2 === 1L)
    assert(got(1L)._1 === 2L && got(2L)._1 === 2L && got(3L)._1 === 4L)
    // input validation: doubles must be quantized by the caller
    val bad = Seq((1L, 0.5)).toDF("doc_id", "x")
    intercept[IllegalArgumentException] {
      Curation.rankEnsemble(bad, "doc_id", Seq(("x", true)), keepPct = 10)
    }
    intercept[IllegalArgumentException] {
      Curation.rankEnsemble(df, "doc_id", Seq(("q", true), ("q", false)), keepPct = 10)
    }
    // a NULL signal fails fast naming the column — silently dropping
    // the row (rank join) while inflating every other rank (nulls-
    // first histogram) is the bug this guard exists to prevent
    val withNull = Seq((1L, java.lang.Long.valueOf(3L)), (2L, null))
      .toDF("doc_id", "q")
    val err = intercept[Exception] {
      Curation.rankEnsemble(withNull, "doc_id", Seq(("q", true)), keepPct = 50)
        .collect()
    }
    assert(err.getMessage.contains("null value in signal 'q'"), err.getMessage)
  }

  test("rankEnsemble: randomized parity with rank() windows (heavy ties, negatives)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    // small value domains force many ties; negatives exercise the
    // descending-by-negation path
    val rows = (1L to 500L).map(i =>
      (i, rnd.nextInt(17).toLong - 8L, rnd.nextInt(5).toLong, rnd.nextInt(400).toLong))
    val df = rows.toDF("doc_id", "a", "b", "c").repartition(7)
    val got = Curation.rankEnsemble(df, "doc_id",
        Seq(("a", false), ("b", true), ("c", false)), keepPct = 35)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val n = rows.size.toLong
    val ref = df
      .withColumn("r_a", rank().over(Window.orderBy(col("a").desc)).cast("long"))
      .withColumn("r_b", rank().over(Window.orderBy(col("b").asc)).cast("long"))
      .withColumn("r_c", rank().over(Window.orderBy(col("c").desc)).cast("long"))
      .collect().map { r =>
        val borda = r.getLong(4) + r.getLong(5) + r.getLong(6)
        r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6), borda,
          borda * 100L <= n * 105L))  // 3 signals * 35 pct
      }.toMap
    assert(got === ref)
    assert(got.values.count(_._5) > 0 && got.values.count(_._5) < rows.size)
  }

  test("capPerGroup: huge groups capped near the target, small groups untouched, deterministic") {
    val df = ((1L to 200L).map(i => (i, "big")) ++ (1001L to 1005L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val kept = Curation.capPerGroup(df, "source", "doc_id", cap = 20)
      .select("doc_id", "source").as[(Long, String)].collect()
    val byGroup = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // under-cap group survives whole
    assert(byGroup("small") === (1001L to 1005L).toSet)
    // big group lands at the cap (exact here — 1M buckets, 200 ids, no
    // bucket collisions), and the survivor set is hash-determined, so
    // a re-run picks the identical sample
    assert(byGroup("big").size === 20)
    val again = Curation.capPerGroup(df, "source", "doc_id", cap = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept.map(_._1).toSet)
  }

  test("lineDedup: corpus-frequent lines struck everywhere, order kept, empty survivors") {
    val docs = Seq(
      (1L, "cookie banner\nunique one\nfooter nav"),
      (2L, "cookie banner\nunique two\nfooter nav"),
      (3L, "cookie banner\nfooter nav"), // all boilerplate -> ""
      (4L, "only original content here")
    ).toDF("doc_id", "text")
    val out = Curation.lineDedup(docs, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("unique one", 3L, 2L)))
    assert(out(2L) === (("unique two", 3L, 2L)))
    assert(out(3L) === (("", 2L, 2L)))           // fully boilerplate, row survives
    assert(out(4L) === (("only original content here", 1L, 0L)))
    // order preserved when several lines survive
    val multi = Seq(
      (1L, "z last\na first\nshared"), (2L, "shared")).toDF("doc_id", "text")
    val kept = Curation.lineDedup(multi, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) === "z last\na first") // original order, not sorted text
  }

  test("gopherFilter: each rule independently drops its violator") {
    // 44 words, 10 distinct (frac 0.227), "the"/"and" stop hits
    val good = ("the quick brown fox ran over the old stone bridge and " * 4).trim
    val docs = Seq(
      (1L, good),                                // passes every rule
      (2L, "too short the a"),                   // < minWords
      (3L, ("a b c d e f g h i j the a " * 5).trim), // mean word len < 3
      (4L, ("quick brown fox jumps stone bridge " * 10).trim), // no stopword hits
      (5L, ("the the the the the the the the " * 8).trim)      // frac unique too low
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "text", minWords = 10)
      .select(col("doc_id"), col("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false))
  }

  test("bpeTrainMerges: greedy fold handles overlap chains and learns by frequency") {
    import spark.implicits._
    // 'aaaa' stresses the same-symbol chain: greedy leftmost gives
    // [aa][aa], never [a][aa][a]; 'abab' stresses the alternating one
    val docs = Seq(
      (1L, "aaaa abab abab"),
      (2L, "aaaa abab xy"),
      (3L, "aaaa xy xy")
    ).toDF("doc_id", "text")
    val m = Curation.bpeTrainMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair stats count every adjacent position, overlaps included
    // (Sennrich's get_stats zips symbols with symbols[1:]): aaaa×3 →
    // (a,a)=9; abab×3 → (a,b)=6. Round 1 picks (a,a); the greedy fold
    // makes aaaa=[aa,aa] (leftmost pairing, NOT [a,aa,a]). Round 2:
    // (a,b)=6. Round 3: abab=[ab,ab] → (aa,aa)=3 ties (x,y)=3 →
    // symbol-order tie-break picks (aa,aa) — pinning both the overlap
    // pairing and the deterministic tie rule
    assert(m.toSeq === Seq((1L, "a", "a", 9L), (2L, "a", "b", 6L), (3L, "aa", "aa", 3L)))
  }

  test("trainHashedLogreg: weights are partition-order invariant and learn the label") {
    import spark.implicits._
    // two "languages" with disjoint vocabulary so 3 GD steps separate them
    val pos = (0 until 40).map(i => (i.toLong, "alpha beta gamma alpha beta", "en"))
    val neg = (40 until 80).map(i => (i.toLong, "delta epsilon zeta delta zeta", "fr"))
    val docs = (pos ++ neg).toDF("doc_id", "text", "lang")
    def train(df: org.apache.spark.sql.DataFrame) =
      Curation.trainHashedLogreg(df, "text", col("lang") === "en",
        dims = 8, iters = 3, lr = 0.5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w1 = train(docs.repartition(1))
    val w13 = train(docs.repartition(13, col("doc_id")))
    // fixed-point gradient accumulation: BIT-equal weights regardless
    // of how rows are partitioned (double sums would differ here)
    assert(w1 === w13)
    // and the model separates the classes: every en doc scores higher
    // than every fr doc under the learned weights
    val wArr = (0 until 8).map(j => w1(j.toLong)).toArray
    def score(text: String): Double = {
      val toks = text.split(" ")
      val counts = new Array[Double](8)
      toks.foreach { t =>
        val h = graft.functions.PolyHash.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        counts((h % 8).toInt) += 1.0
      }
      (0 until 8).map(j => wArr(j) * counts(j) / toks.length).sum[Double]
    }
    assert(score("alpha beta gamma alpha beta") > score("delta epsilon zeta delta zeta"))
  }

  test("phrase search: index path equals the document-local scan path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big order scan runs a big order scan today"), // 2 hits
      (2L, "big order but no scan here"),                 // near miss
      (3L, "order scan big"),                             // wrong order
      (4L, "big order scan"),                             // exact doc
      (5L, ""),                                           // empty
      (6L, "scan")                                        // shorter than phrase
    ).toDF("doc_id", "text")
    val phrase = Seq("big", "order", "scan")
    val viaScan = docs
      .select(col("doc_id"), Curation.phraseHits(col("text"), phrase).as("hits"))
      .filter(col("hits") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaScan === Map(1L -> 2, 4L -> 1))
    val idxPath = java.nio.file.Files.createTempDirectory("phrase-idx").toString
    Curation.buildPhraseIndex(docs, "doc_id", "text", idxPath)
    val viaIndex = Curation.phraseSearch(
        spark.read.parquet(idxPath), "doc_id", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaIndex.toSet === Set((1L, 2L, 1L), (4L, 1L, 1L)))
    // single-term phrase degenerates to a postings lookup
    val single = Curation.phraseSearch(spark.read.parquet(idxPath), "doc_id",
        Seq("scan")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 6L -> 1L))
  }

  test("vocabCoverage: counts with multiplicity, O(1) at 50k-vocab size") {
    val docs = Seq(
      ("web", "the cat sat on the mat"),     // 6 tokens
      ("web", "unknownzz words здесь"),      // 3 tokens, 1 in vocab
      ("code", "def cat(): return mat")      // tokens per TextFunctions
    ).toDF("src", "text")
    // a realistic tokenizer-scale vocabulary (50k entries) — the audit
    // must stay hash-set O(1) per token, not scan the vocab per token
    val vocab = Seq("the", "cat", "sat", "on", "mat", "words", "def", "return") ++
      (1 to 50000).map(i => s"vocabfiller$i")
    val t0 = System.nanoTime()
    val out = Curation.vocabCoverage(docs, Seq("src"), "text", vocab)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    val webText = Seq("the", "cat", "sat", "on", "the", "mat",
      "unknownzz", "words", "здесь")
    val vocabSet = vocab.toSet
    assert(out("web")._1 === 9L)
    assert(out("web")._2 === webText.count(vocabSet))
    assert(out("code")._1 > 0L && out("code")._2 >= 2L)
    // generous bound: the array_contains form took O(|vocab|) per
    // token (~10^4 comparisons each); the hash set is flat
    assert(elapsedMs < 30000, s"vocab membership should be O(1), took $elapsedMs ms")
  }

  test("snapshotDrift: integer share flags, new/old-only strata always drift") {
    def snap(rows: (String, Long)*) = rows.toSeq.toDF("src", "len")
    // old: a=50, b=50; new: a=50, b=20 (b's share collapses), c appears
    val old = snap((1L to 50L).map(i => ("a", i)) ++ (1L to 50L).map(i => ("b", i)): _*)
    val nw = snap((1L to 50L).map(i => ("a", i)) ++ (1L to 20L).map(i => ("b", i))
      ++ Seq(("c", 7L)): _*)
    val out = Curation.snapshotDrift(old, nw, Seq("src"), "len", driftPct = 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(5))).toMap
    assert(out("a") == ((50L, 50L, true)))  // a's share rose 50/100 -> 50/71
    assert(out("b") == ((50L, 20L, true)))
    assert(out("c")._1 == 0L && out("c")._3)  // new-only stratum flags
    // balanced split does not flag
    val even = Curation.snapshotDrift(
      snap(("a", 1L), ("a", 2L), ("b", 3L)), snap(("a", 9L), ("a", 8L), ("b", 4L)),
      Seq("src"), "len", driftPct = 20)
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(even == Map("a" -> false, "b" -> false))
  }

  test("kAnonymityAudit: size histogram, risky strictly below k, multi-column combos") {
    val rows = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L),  // ("a",1) ×3
      ("a", 2L),                        // ("a",2) ×1 — risky
      ("b", 1L), ("b", 1L), ("b", 1L))  // ("b",1) ×3
      .toDF("c1", "c2")
    val out = Curation.kAnonymityAudit(rows, Seq("c1", "c2"), k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // size 3 appears for two groups (6 rows, not risky at k=3 —
    // strictly-below rule); the singleton is risky
    assert(out === Map(
      3L -> ((2L, 6L, false)),
      1L -> ((1L, 1L, true))), out.toString)
    intercept[IllegalArgumentException] {
      Curation.kAnonymityAudit(rows, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Curation.kAnonymityAudit(rows, Seq("c1"), k = 1)
    }
  }

  test("langScriptAudit: disagreement cells flagged, expected-script langs only") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog"), // en + latin: clean
      (2L, "the жеч托 жзжзж зжзж and жжзз the ж"),   // en by stopwords, cyrillic mass
      (3L, "中中中中中"),                             // zh via cjk ratio, cjk dominant
      (4L, "ж жж жжж"))                              // no stopwords: und, no expectation
      .toDF("doc_id", "text")
    val out = Curation.langScriptAudit(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out === Map(
      ("en", "latin") -> ((1L, false)),
      ("en", "cyrillic") -> ((1L, true)),
      ("zh", "cjk") -> ((1L, false)),
      ("und", "cyrillic") -> ((1L, false))), out.toString)
  }

  test("bootstrapReplicates: exact inverse-CDF weights, mass near n, empty replicate") {
    import graft.functions.PolyHash
    import org.apache.spark.unsafe.types.UTF8String
    def weightOf(id: Long, rep: Int): Long = {
      val u = PolyHash.hash(UTF8String.fromString(s"$id:$rep")) % 1048576L
      val i = Curation.PoissonUnitCdf20.indexWhere(u < _)
      if (i < 0) Curation.PoissonUnitCdf20.length.toLong else i.toLong
    }
    val docs = (1L to 200L).map(i => (i, i * 10)).toDF("doc_id", "qm")
    val out = Curation.bootstrapReplicates(docs, "doc_id", "qm", reps = 8)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === (0 until 8).toSet)
    (0 until 8).foreach { rep =>
      // the frame's weights ARE the replayed inverse-CDF draws
      val ws = (1L to 200L).map(i => i -> weightOf(i, rep))
      val expN = ws.map(_._2).sum
      val expS = ws.map { case (i, w) => w * i * 10 }.sum
      assert(out(rep) === ((expN, expS, if (expN > 0) expS / expN else 0L)),
        s"rep $rep: ${out(rep)} vs ($expN, $expS)")
      // Poisson(1) mass: n_eff concentrates near n
      assert(expN > 140 && expN < 260, s"rep $rep n_eff=$expN")
    }
    // a replicate can weight a lone doc 0 → n_eff 0 → mean_q 0, no div-by-zero
    val one = Curation.bootstrapReplicates(
      Seq((7L, 100L)).toDF("doc_id", "qm"), "doc_id", "qm", reps = 32)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(one.exists(_._1 === 0L) || one.forall(_._1 > 0L)) // shape holds
    one.foreach { case (n, m) => assert(if (n == 0) m == 0L else m == 100L) }
    intercept[IllegalArgumentException] {
      Curation.bootstrapReplicates(docs, "doc_id", "qm", reps = 0)
    }
    // a null metric never enters the resample — n_eff excludes its
    // weight rather than biasing the mean toward zero
    val withNull = Curation.bootstrapReplicates(
      Seq((1L, Some(100L)), (2L, None)).toDF("doc_id", "qm"),
      "doc_id", "qm", reps = 4)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    withNull.foreach { case (n, m) => assert(if (n == 0) m == 0L else m == 100L) }
  }

  test("robustOutlierReport: lower median, MAD, 3-MAD rule, null skip") {
    val rows = Seq(
      // even group: q [1,2,2,9] → med 2 (lower), devs [1,0,0,7] →
      // MAD 0 → every nonzero deviation is an outlier
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)), ("a", Some(9.0)),
      // odd group with one extreme: med 3, devs sorted [0,1,1,2,97]
      // → MAD 1 → only the extreme row is outside 3·MAD
      ("b", Some(1.0)), ("b", Some(2.0)), ("b", Some(3.0)), ("b", Some(4.0)),
      ("b", Some(100.0)),
      // nulls don't count anywhere
      ("c", Some(5.0)), ("c", None))
      .toDF("g", "v")
    val out = Curation.robustOutlierReport(rows, "g", "v", scaleBits = 0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      "a" -> ((4L, 2L, 0L, 2L)),
      "b" -> ((5L, 3L, 1L, 1L)),
      "c" -> ((1L, 5L, 0L, 0L))), out.toString)
    // the quantized grid: scaleBits=2 puts 0.25-steps on integers
    val q = Curation.robustOutlierReport(
      Seq(("x", 0.25), ("x", 0.5), ("x", 0.75)).toDF("g", "v"),
      "g", "v", scaleBits = 2).head()
    assert(q.getLong(2) === 2L) // trunc(0.5·4) = 2
  }

  test("dupNgramCoverage: union-of-windows counted once, short docs zero") {
    val docs = Seq(
      // "a b" repeats at 1 and 3 → windows {1,2} ∪ {3,4} cover all 4
      // dup positions of the 5 words (char mass 4 of 5)
      (1L, "a b a b c"),
      // overlapping occurrences ("x x" at 1 and 2) cover 3 positions,
      // NOT 4 — the union semantics, not the per-occurrence sum
      (2L, "x x x"),
      // no repeated bigram → zero coverage, row still present
      (3L, "q r s t"),
      // shorter than n → zero coverage, row still present
      (4L, "q")).toDF("doc_id", "text")
    val out = Curation.dupNgramCoverage(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out === Map(
      1L -> ((5, 4, 4L, 800L)),
      2L -> ((3, 3, 3L, 1000L)),
      3L -> ((4, 0, 0L, 0L)),
      4L -> ((1, 0, 0L, 0L))), out.toString)
    // char mass weights longer words: "aa bb aa bb" dup "aa bb"
    // covers everything; frac is exactly 1000 even with 2-char words
    val w = Curation.dupNgramCoverage(
      Seq((9L, "aa bb aa bb")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .head()
    assert(w.getLong(4) === 8L && w.getLong(5) === 1000L)
    assert(intercept[IllegalArgumentException] {
      Curation.dupNgramCoverage(docs, "doc_id", "text", 1)
    }.getMessage.contains("dupNgramCoverage"))
  }

  test("topNgramFraction: hand-computed winner, tie-break, short-doc drop") {
    val docs = Seq(
      // "a b" x2 (overlapping at "b a b"), "b a" x1, "b c" x1 — top is "a b"
      (1L, "a b a b c"),
      // all bigrams distinct, counts tie at 1 → binary-largest gram wins
      (2L, "x y z"),
      (3L, "solo")) // 1 token, no bigram → no row
      .toDF("doc_id", "text")
    val out = Curation.topNgramFraction(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._1 === "a b" && out(1L)._2 === 2L)
    // 2 occurrences × 3 chars / 9 chars
    assert(math.abs(out(1L)._3 - 6.0 / 9.0) < 1e-12)
    assert(out(2L)._1 === "y z") // tie on count=1, "y z" > "x y"
    // dominant phrase spam caps at 1.0
    val spam = Seq((9L, "buy now buy now buy now")).toDF("doc_id", "text")
    val s = Curation.topNgramFraction(spam, "doc_id", "text").head()
    assert(s.getString(1) === "now buy" || s.getString(1) === "buy now")
    assert(s.getDouble(3) <= 1.0)
  }

  test("topNgramFraction: fused kernel equals the declarative reference") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "x y z"),
      (3L, "solo"),
      (4L, ""),                          // split("","-1") edge: one empty token
      (5L, "t  t  t"),                   // double spaces -> empty tokens between
      (6L, "z z z z"),                   // heavy overlap
      (7L, "aa bb aa bb cc aa bb")       // count tie-break inside real text
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val fused = Curation.topNgramFraction(docs, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    val ref = Curation.topNgramFractionDeclarative(docs, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    assert(fused === ref)
    // and over the real corpus
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val f2 = Curation.topNgramFraction(corpus, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    val r2 = Curation.topNgramFractionDeclarative(corpus, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    assert(f2 === r2)
    // seeded fuzz: tiny alphabet maximizes count ties and repeated
    // grams; random double spaces exercise empty-token splits
    val rnd = new scala.util.Random(23)
    val fuzz = (100L to 299L).map { i =>
      val words = Seq.fill(rnd.nextInt(12))(Seq("a", "b", "aa", "ab")(rnd.nextInt(4)))
      (i, words.mkString(if (rnd.nextBoolean()) " " else "  "))
    }.toDF("doc_id", "text")
    val f3 = Curation.topNgramFraction(fuzz, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    val r3 = Curation.topNgramFractionDeclarative(fuzz, "doc_id", "text")
      .collect().map(key).sortBy(_._1).toSeq
    assert(f3 === r3)
  }

  test("scriptProfile: per-block counts, dominance, priority tie-break") {
    val docs = Seq(
      (1L, "hello world 42"),                  // latin dominant
      (2L, "\u043f\u0440\u0438\u0432\u0435\u0442 ok"), // 6 cyrillic > 2 latin
      (3L, "\u4e2d\u6587\u6587\u6863"),     // pure CJK
      (4L, "ab\u0431\u0432"),                // 2 latin == 2 cyrillic: latin wins by priority
      (5L, "12345"),                           // digits only
      (6L, "   ")) // nothing scored
      .toDF("doc_id", "text")
    val out = Curation.scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(3), r.getInt(5), r.getString(7)))).toMap
    assert(out(1L) === ((10, 0, 0, "latin")))
    assert(out(2L) === ((2, 6, 0, "cyrillic")))
    assert(out(3L) === ((0, 0, 4, "cjk")))
    assert(out(4L) === ((2, 2, 0, "latin")))
    assert(out(5L)._4 === "digit")
    assert(out(6L)._4 === "none")
  }

  test("nfcAudit: decomposed text composes, clean text passes unchanged") {
    val docs = Seq(
      (1L, "cafe\u0301"), // decomposed e+combining-acute: composes to 4 codepoints
      (2L, "cafe"), // ASCII, already NFC
      (3L, "caf\u00e9")) // precomposed, already NFC
      .toDF("doc_id", "text")
    val out = Curation.nfcAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L)._1 === true)
    assert(out(2L)._1 === false && out(3L)._1 === false)
    assert(out(1L)._2 === 4 && out(3L)._2 === 4)
    // decomposed input normalizes to exactly the precomposed doc's bytes
    assert(out(1L)._3 === out(3L)._3)
    assert(out(2L)._3 !== out(3L)._3)
    // idempotence: normalizing an already-audited-clean doc is identity
    val once = graft.functions.NativeExpressions.nfcNormalize(col("text"))
    val twice = graft.functions.NativeExpressions.nfcNormalize(once)
    assert(docs.select((once === twice).as("eq")).collect().forall(_.getBoolean(0)))
  }

  test("mixturePlan: cap deficit, zero-weight, absent stratum, flooring reports no deficit") {
    // corpus: a has 10 tokens, b 40, c 50, d 7 (docs of 10 or 7 tokens)
    val docs = Seq(
      (1L, "a", "t t t t t t t t t t"),
      (2L, "b", "t t t t t t t t t t"), (3L, "b", "t t t t t t t t t t"),
      (4L, "b", "t t t t t t t t t t"), (5L, "b", "t t t t t t t t t t"),
      (6L, "c", "t t t t t t t t t t"), (7L, "c", "t t t t t t t t t t"),
      (8L, "c", "t t t t t t t t t t"), (9L, "c", "t t t t t t t t t t"),
      (10L, "c", "t t t t t t t t t t"),
      (11L, "d", "t t t t t t t"))
      .toDF("doc_id", "src", "text")
    val out = Curation.mixturePlan(docs, "src", "text",
      budget = 100L,
      weightsPm = Map("a" -> 600L, "b" -> 400L, "z" -> 200L, "d" -> 50L),
      maxMilliEpochs = 3000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6), r.getLong(7), r.getLong(8)))).toMap
    // a: target 60 over 10 available -> 6000 milli-epochs, capped at
    // 3000 -> planned 30, deficit 30 (the relax-the-cap signal)
    assert(out("a") === ((10L, 600L, 60L, 3000L, true, 30L, 30L)))
    // b: target 40 over 40 available -> exactly one epoch, no deficit
    assert(out("b") === ((40L, 400L, 40L, 1000L, false, 40L, 0L)))
    // c: carries no weight -> plans nothing
    assert(out("c") === ((50L, 0L, 0L, 0L, false, 0L, 0L)))
    // z: weighted but ABSENT from the corpus — the row still surfaces,
    // cap-bound with the whole target as deficit (typo'd-key signal)
    assert(out("z") === ((0L, 200L, 20L, 3000L, true, 0L, 20L)))
    // d: target 5 over 7 available floors planned to 4 — but the cap
    // does not bind, so the 1-token flooring remainder reports NO
    // deficit (deficit is purely the cap signal, never rounding noise)
    assert(out("d") === ((7L, 50L, 5L, 714L, false, 4L, 0L)))
    intercept[IllegalArgumentException] {
      Curation.mixturePlan(docs, "src", "text", -1L, Map.empty)
    }
    intercept[IllegalArgumentException] {
      Curation.mixturePlan(docs, "src", "text", 1L, Map("a" -> 1001L))
    }
  }

  test("mixtureSchedule: endpoints exact, interpolation integer, absent strata surface") {
    // natural: a = 30/40 = 750pm, b = 10/40 = 250pm; targets a=200, b=600
    val docs = Seq(
      ("a", "w w w w w w w w w w w w w w w w w w w w w w w w w w w w w w"),
      ("b", "w w w w w w w w w w")
    ).toDF("src", "text")
    val out = Curation.mixtureSchedule(docs, "src", "text",
      epochs = 3, budgetPerEpoch = 1000L,
      Map("a" -> 200L, "b" -> 600L, "z" -> 200L))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // epoch 0 = natural, last epoch = target, middle = integer midpoint
    assert(out((0L, "a")) === ((750L, 200L, 750L, 750L)))
    assert(out((2L, "a")) === ((750L, 200L, 200L, 200L)))
    assert(out((1L, "a")) === ((750L, 200L, 750L + (200L - 750L) / 2, 475L)))
    assert(out((0L, "b")) === ((250L, 600L, 250L, 250L)))
    assert(out((2L, "b")) === ((250L, 600L, 600L, 600L)))
    // z: weighted but absent from the corpus — surfaces, annealing in
    // from zero natural share
    assert(out((0L, "z")) === ((0L, 200L, 0L, 0L)))
    assert(out((2L, "z")) === ((0L, 200L, 200L, 200L)))
    assert(out.size === 9)
    intercept[IllegalArgumentException] {
      Curation.mixtureSchedule(docs, "src", "text", 1, 1000L, Map.empty)
    }
  }

  test("corpusCard: mass, diversity, dup share, explicit discrete quantiles") {
    // 10 docs: token lengths 1..9 + one null text; doc 2 duplicates
    // doc 1's text (9 non-null docs, 8 distinct -> dup 111 milli)
    val docs = Seq(
      (1L, "w", "en", "a"), (2L, "w", "en", "a"),
      (3L, "w w w", "en", "b"), (4L, "w w w w", "de", "b"),
      (5L, "w w w w w", "de", "b"), (6L, "w w w w w w", "fr", "c"),
      (7L, "w w w w w w w", "fr", "c"), (8L, "w w w w w w w w", "fr", "c"),
      (9L, "w w w w w w w w w", "fr", "c"),
      (10L, null.asInstanceOf[String], "fr", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val r = Curation.corpusCard(docs, "doc_id", "text", "lang", "source").head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 44L) // 1+1+3+..+9
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L)   // langs, sources
    assert(r.getLong(4) === 1L && r.getLong(5) === 8L)   // null, distinct
    assert(r.getLong(6) === 111L, r.toString)            // 1/9 dup share
    // lengths sorted: 1,1,3,4,5,6,7,8,9 (n=9): median = smallest v
    // with cum*2 >= 9 -> cum >= 5 -> v=5 (the middle order statistic);
    // p90: cum*10 >= 81 -> cum >= 9 -> v=9
    assert(r.getLong(7) === 5L && r.getLong(8) === 9L, r.toString)
  }

  test("curriculumOrder: difficulty progression per shard, epoch reshuffle within level") {
    val docs = (0L until 64L).map(i => (i, i % 4)).toDF("doc_id", "difficulty")
    def run(epoch: Int) = Curation.curriculumOrder(docs, "doc_id", "difficulty",
      epoch, shards = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    val e1 = run(1)
    val e2 = run(2)
    // within every shard, pos order is non-decreasing in difficulty
    for (e <- Seq(e1, e2); (_, rows) <- e.values.groupBy(_._2)) {
      val byPos = rows.toSeq.sortBy(_._3).map(_._1)
      assert(byPos === byPos.sorted, byPos.toString)
    }
    // shard placement is epoch-independent; within-level order is not
    assert(e1.forall { case (id, (_, sh, _)) => e2(id)._2 == sh })
    assert(e1.exists { case (id, (_, _, pos)) => e2(id)._3 != pos },
      "epoch seed must reshuffle within difficulty levels")
    // positions are a permutation of 1..n per shard
    for ((_, rows) <- e1.values.groupBy(_._2))
      assert(rows.map(_._3).toSeq.sorted === (1 to rows.size), rows.toString)
    intercept[IllegalArgumentException] {
      Curation.curriculumOrder(docs, "doc_id", "difficulty", 1, shards = 0)
    }
  }

  test("boilerplateReport: source-scoped template lines, share gate, per-doc dedup") {
    val docs = Seq(
      // siteA: 4 docs, header on all 4, a 2-doc line, a 1-doc line
      (1L, "A", "header nav\nbody one"),
      (2L, "A", "header nav\nshared para\nbody two"),
      (3L, "A", "header nav\nshared para"),
      (4L, "A", "header nav\nheader nav\nonly here"), // repeated IN-doc: df counts docs, not lines
      // siteB: 2 docs, its own header — same TEXT as a siteA line but
      // scoped to B
      (5L, "B", "header nav\nb body"),
      (6L, "B", "b body")
    ).toDF("doc_id", "source", "text")
    val out = Curation.boilerplateReport(docs, "doc_id", "text", "source",
      minDf = 2, minShareMilli = 500)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // A: header df=4/4 (doc 4's duplicate line counted once), shared para 2/4 = 500
    assert(out(("A", "header nav")) === ((4L, 4L, 1000L)))
    assert(out(("A", "shared para")) === ((2L, 4L, 500L)))
    // B: header nav df=1 of 2 -> below minDf; b body 2/2
    assert(!out.contains(("B", "header nav")))
    assert(out(("B", "b body")) === ((2L, 2L, 1000L)))
    assert(out.size === 3, out.toString)
    intercept[IllegalArgumentException] {
      Curation.boilerplateReport(docs, "doc_id", "text", "source", minDf = 1)
    }
  }

  test("vocabGrowth: first-bucket attribution, cumulative types and mass") {
    // ids 0..9, 2 buckets -> bucket 1 = ids 0..4, bucket 2 = ids 5..9
    val docs = (0L to 9L).map { i =>
      val text = if (i < 5) "alpha beta" else "alpha gamma delta"
      (i, text)
    }.toDF("doc_id", "text")
    val out = Curation.vocabGrowth(docs, "doc_id", "text", buckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // bucket 1: types {alpha, beta} new, 10 tokens
    assert(out(1L) === ((2L, 10L, 2L, 10L)))
    // bucket 2: {gamma, delta} new (alpha already seen), 15 tokens
    assert(out(2L) === ((2L, 15L, 4L, 25L)))
    intercept[IllegalArgumentException] {
      Curation.vocabGrowth(docs, "doc_id", "text", buckets = 1)
    }
  }

  test("zipfAudit: rank by (cnt desc, token asc), products vs rank-1 mass") {
    // counts: the=6, of=3, to=2, zz=1  -> ideal-ish Zipf head
    val docs = Seq(
      (1L, "the the the of of to"),
      (2L, "the the the of to zz")
    ).toDF("doc_id", "text")
    val out = Curation.zipfAudit(docs, "text", topK = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) === (("the", 6L, 6L, 1000L)))
    assert(out(2L) === (("of", 3L, 6L, 1000L)))
    assert(out(3L) === (("to", 2L, 6L, 1000L)))
    assert(out.size === 3) // topK honored: zz excluded
    intercept[IllegalArgumentException] {
      Curation.zipfAudit(docs, "text", topK = 0)
    }
  }
}
