package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.pipeline.{Dedup, Similarity}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per distinct text") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(groups.length === 3)
    val dup = groups.find(_.getAs[Long]("n_dups") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
    assert(Dedup.exactDedup(docs, "text", "doc_id").collect().length === 3)
  }

  test("hash-first exact dedup equals the text-grouped summary, dup branch included") {
    // docs has a real duplicate pair → the multiplicity>1 collide
    // branch runs its exact text verify (the gate corpus is dup-free,
    // so this is the path's behavioral pin)
    val byHash = Dedup.exactGroupsByHash(docs, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).sorted
    val byText = Dedup.exactGroups(docs, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups"))).sorted
    assert(byHash.toSeq === byText.toSeq)
    assert(byHash.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("shingles produce distinct word n-grams; short texts empty") {
    val sh = spark.range(1).select(Dedup.shingles(lit("a b c d"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = spark.range(1).select(Dedup.shingles(lit("a b"), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("jaccard pairs find near-dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical => jaccard 1
    assert(pairs.contains((1L, 2L))) // near-dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("rrfFuse: overlap outranks any single first place, integer weights exact") {
    import graft.pipeline.Similarity
    // list A: 1,2,3 — list B: 3,4,5. id 3 (rank 3 + rank 1) fuses
    // 1048576 div 63 + 1048576 div 61 = 16644 + 17189 = 33833, beating
    // id 1's solo first place (1048576 div 61 = 17189)
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((3L, 1), (4L, 2), (5L, 3)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.head === ((3L, 33833L, 2L, 1)), out.toSeq.toString)
    assert(out(1) === ((1L, 17189L, 1L, 2)), out.toSeq.toString)
    // equal fused scores tie to the smaller id: ids 2 and 4 both hold
    // a solo rank 2 (1048576//62 = 16912)
    val i2 = out.indexWhere(_._1 == 2L)
    val i4 = out.indexWhere(_._1 == 4L)
    assert(out(i2)._2 === 16912L && out(i4)._2 === 16912L && i2 < i4)
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(Seq(a), "id")
    }
  }

  test("containment pairs: subset duplication invisible to jaccard, df cap honored") {
    // small doc fully inside a much larger host: C(small→host) = 1
    // while J = |A|/|B| is far below any dedup threshold
    val small = "q1 q2 q3 q4 q5 q6"                       // 4 3-gram shingles
    val host = small + " " + (1 to 40).map(i => s"h$i").mkString(" ")
    val corpus = Seq((1L, small), (2L, host), (3L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, "doc_id", "text",
      n = 3, tMilli = 900, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out.keySet === Set((1L, 2L)), out.toString)
    val (inter, c1, c2) = out((1L, 2L))
    assert(inter === 4L && c1 === 1000L && c2 < 200L, out.toString)
    // the same pair is invisible to jaccardPairs at any usable threshold
    val j = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    // df cap: a gram present in EVERY doc cannot generate candidates
    // on its own — docs overlapping only in boilerplate pair with
    // maxDf high, not with maxDf 2
    val boiler = Seq((1L, "b1 b2 b3 z1 z2 z3"), (2L, "b1 b2 b3 y1 y2 y3"),
      (3L, "b1 b2 b3 w1 w2 w3"), (4L, "b1 b2 b3 v1 v2 v3"))
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(boiler, "doc_id", "text",
      n = 3, tMilli = 100, maxDf = 2).count()
    val uncapped = Dedup.containmentPairs(boiler, "doc_id", "text",
      n = 3, tMilli = 100, maxDf = 100).count()
    assert(capped === 0L && uncapped === 6L, s"$capped / $uncapped")
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(corpus, "doc_id", "text", tMilli = 0)
    }
  }

  test("winnow pairs: copied passage guaranteed caught, df cap, short docs excluded") {
    // two docs sharing a verbatim >= k+w-1 = 11-char run MUST share a
    // fingerprint (the winnowing guarantee); the third is disjoint text
    val passage = "unmistakable copied passage body"
    val corpus = Seq(
      (1L, "lead in words " + passage + " trailing material one"),
      (2L, "other document entirely " + passage + " with its own tail"),
      (3L, "completely different content with zero shared substrings"),
      (4L, "tiny")) // < k+w-1 chars: no fingerprint, excluded
      .toDF("doc_id", "text")
    val out = Dedup.winnowPairs(corpus, "doc_id", "text",
      k = 8, w = 4, minShared = 1, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 2L)), out.toString)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // identical docs share ALL fingerprints: overlap_milli = 1000
    val twin = Seq((1L, passage + " same exact body text"),
      (2L, passage + " same exact body text")).toDF("doc_id", "text")
    val tw = Dedup.winnowPairs(twin, "doc_id", "text", minShared = 1)
      .select("overlap_milli").as[Long].collect()
    assert(tw === Array(1000L))
    // df cap: a fingerprint present in every doc generates no
    // candidates once its doc frequency exceeds maxDf
    val boiler = (1L to 5L).map(i =>
      (i, passage + s" unique$i tail$i filler$i")).toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(boiler, "doc_id", "text",
      minShared = 1, maxDf = 2).count()
    val uncapped = Dedup.winnowPairs(boiler, "doc_id", "text",
      minShared = 1, maxDf = 100).count()
    assert(capped === 0L && uncapped === 10L, s"$capped / $uncapped")
    intercept[IllegalArgumentException] {
      Dedup.winnowPairs(corpus, "doc_id", "text", maxDf = 1)
    }
  }

  test("winnow pairs: duplicated input ids neither double-count shared_fps nor shift the df cap") {
    // a re-fed corpus: doc 1's row appears twice. shared_fps and the
    // df cap must behave exactly as if each id appeared once (ADVICE
    // r9: count(*) vs countDistinct drift between operator and report)
    val passage = "unmistakable copied passage body"
    val once = Seq(
      (1L, "lead in words " + passage + " trailing material one"),
      (2L, "other document entirely " + passage + " with its own tail"))
      .toDF("doc_id", "text")
    val refed = once.unionAll(once.filter($"doc_id" === 1L))
    def snap(df: org.apache.spark.sql.DataFrame) =
      Dedup.winnowPairs(df, "doc_id", "text", minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(snap(refed) === snap(once))
    // df cap under duplication: 2 distinct docs re-fed to 4 rows must
    // still pass maxDf = 2 (row-count df would read 4 and drop all)
    val cappedRefed = Dedup.winnowPairs(refed, "doc_id", "text",
      minShared = 1, maxDf = 2).count()
    assert(cappedRefed === 1L, s"$cappedRefed")
  }

  test("dedupSavings: per-size groups, kept = label, singletons absent") {
    // one triple (ids 1,2,3 — keep 1) and one pair (ids 10,11 — keep
    // 10); doc 20 has no near-dup and must NOT appear (components
    // only cover paired docs)
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (10L, "omega psi chi"), (11L, "omega psi chi"),
      (20L, "entirely unrelated text here")
    ).toDF("doc_id", "text")
    val comps = graft.pipeline.Dedup.connectedComponents(
      graft.pipeline.Dedup.simhashEdges(docs, "doc_id", "text", maxHamming = 0),
      "id1", "id2")
    val out = graft.pipeline.Dedup.dedupSavings(docs, "doc_id", "text", comps)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // triple: 3 docs x 4 tokens = 12 total, keep 4 -> save 8
    assert(out(3L) === ((1L, 3L, 12L, 8L)), out.toString)
    // pair: 2 x 3 = 6 total, keep 3 -> save 3
    assert(out(2L) === ((1L, 2L, 6L, 3L)), out.toString)
    assert(out.size === 2)
  }

  test("winnowFpStats: df histogram with pair-slot mass, capped flag, no pairs") {
    // 3 identical docs: every fingerprint has df=3 -> one histogram
    // row with pair_slots = n_fps * C(3,2)
    val tri = (1L to 3L).map(i => (i, "exactly the same body of copied text here"))
      .toDF("doc_id", "text")
    val out = Dedup.winnowFpStats(tri, "doc_id", "text", maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet === Set(3L), out.toString)
    val (nFps, slots, capped) = out(3L)
    assert(slots === nFps * 3 && capped, out.toString) // df=3 > maxDf=2
    // the report's pair_slots at df <= maxDf equals what winnowPairs
    // would enumerate: 2 twins -> df=2 rows, slots = n_fps * 1
    val twins = (1L to 2L).map(i => (i, "another fully identical passage body"))
      .toDF("doc_id", "text")
    val st = Dedup.winnowFpStats(twins, "doc_id", "text", maxDf = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val enumerated = Dedup.winnowPairs(twins, "doc_id", "text", minShared = 1)
      .select("shared_fps").as[Long].collect().sum
    assert(st(2L) === enumerated, s"${st(2L)} vs $enumerated")
  }

  test("minhash: identical texts get identical signatures; lsh finds dups") {
    val sigs = docs.select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(4L))
    assert(sigs(1L) !== sigs(3L))
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("sourceOverlapMatrix rolls near-dup pairs up by unordered source pair") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "crawl"),
      (2L, "alpha beta gamma delta epsilon zeta", "curated"), // dup of 1, crosses sources
      (3L, "alpha beta gamma delta epsilon zeta", "crawl"),   // dup of 1, same source
      (4L, "totally different words nothing shared here", "curated")
    ).toDF("doc_id", "text", "source")
    val m = graft.pipeline.Dedup.sourceOverlapMatrix(df, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("crawl", "curated")) === 2L) // (1,2) and (2,3)
    assert(m(("crawl", "crawl")) === 1L)   // (1,3)
    assert(!m.contains(("curated", "curated")))
    graft.pipeline.Dedup.releaseCaches()
  }

  test("releaseCaches unpersists every intermediate Dedup cached") {
    // compare against a BASELINE snapshot, not global emptiness:
    // other suites (shared session) may hold their own caches or have
    // async unpersists in flight — this test owns only Dedup's delta
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.9).collect()
    Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5).collect()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- baseline).nonEmpty)
    Dedup.releaseCaches()
    // non-blocking unpersist: the CacheManager entry is dropped
    // synchronously, so re-listing shows no graft-held cache beyond
    // the baseline
    assert((spark.sparkContext.getPersistentRDDs.keySet -- baseline).isEmpty)
    // results stay valid after release (plans recompute)
    assert(Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().nonEmpty)
    Dedup.releaseCaches()
  }

  test("simhash: identical => equal, near-dup => small hamming") {
    val sk = docs.select($"doc_id", Dedup.simhash($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) === sk(4L))
    assert(java.lang.Long.bitCount(sk(1L) ^ sk(2L)) <= 6)
  }

  test("connected components resolve pair graphs into min-id groups") {
    // two components {1,2,3,9} (chain) and {5,6}; 7-8 separate
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L), (7L, 8L)).toDF("id1", "id2")
    val cc = graft.pipeline.Dedup.connectedComponents(pairs, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))

    // non-numeric ids must work too (a long cast would null them out)
    val sPairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("id1", "id2")
    val sc = graft.pipeline.Dedup.connectedComponents(sPairs, "id1", "id2")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sc === Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"))
  }

  test("nearDupDedupBy keeps the max-pref member per group, ties to lowest id") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 7L), (9L, 1L))
      .toDF("doc_id", "quality")
    // group {1,2,3}: 2 and 3 tie on quality 30 -> keep 2; group {5}: alone
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val kept = graft.pipeline.Dedup.nearDupDedupBy(docs, "doc_id", pairs, "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 5L, 9L))
  }

  test("splitAssign: deterministic 90/5/5 partition of the corpus, no migration") {
    val df = (0L until 2000L).toDF("doc_id")
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val s1 = df.select($"doc_id", graft.pipeline.Curation.splitAssign("doc_id", splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(s1.values.toSet === Set("train", "val", "test"))
    assert(s1.values.count(_ == "train") > 1600)
    // appending rows never migrates existing ids between splits
    val s2 = (0L until 4000L).toDF("doc_id")
      .select($"doc_id", graft.pipeline.Curation.splitAssign("doc_id", splits).as("s"))
      .as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    intercept[IllegalArgumentException] {
      graft.pipeline.Curation.splitAssign("doc_id", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("connected components: hybrid local finish agrees with pure distributed rounds") {
    // a long chain (worst case for label propagation) + two extra
    // components; run once with the local tail finish enabled (default)
    // and once forced fully distributed — identical labelings required
    val chain = (0L until 60L).map(i => (i, i + 1)) ++ Seq((100L, 101L), (200L, 202L))
    val pairs = chain.toDF("id1", "id2")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hybrid = asMap(graft.pipeline.Dedup.connectedComponents(pairs, "id1", "id2"))
    val distributed = asMap(graft.pipeline.Dedup.connectedComponents(
      pairs, "id1", "id2", localEdgeThreshold = 0L))
    assert(hybrid === distributed)
    assert((0L to 60L).forall(hybrid(_) === 0L))
    assert(hybrid(101L) === 100L && hybrid(202L) === 200L)
  }

  test("substringDupRemove: duplicated spans cut, unique tails and short docs intact") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ") // the shared 10-gram
    val docs = Seq(
      (1L, s"$span alpha beta gamma"),
      (2L, s"$span delta epsilon"),
      (3L, "entirely unique content that repeats nowhere in this corpus at all"),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.substringDupRemove(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "alpha beta gamma") // span removed, tail kept
    assert(out(2L) === "delta epsilon")
    assert(out(3L) === "entirely unique content that repeats nowhere in this corpus at all")
    assert(out(4L) === "short doc") // < w tokens: untouched
  }

  test("cosine and brute-force top-k") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding", 1)
      .collect()
    assert(top.length === 1)
    assert(top.head.getAs[Long]("cid") === 2L)
  }

  test("mmrTopK: diversification skips the near-copy a plain top-k would take") {
    // query between two clusters; a1/a2 near-copies in one cluster, b
    // alone in the other with lower relevance. Plain top-2 = {a1, a2};
    // MMR picks a1 then b — a2's similarity penalty (cos(a1,a2) ≈ 1)
    // sinks it while b pays almost none (cos(a1,b) = .19).
    val vecs = Seq(
      (0L, Array(0.71f, 0.70f)),     // query
      (1L, Array(0.98f, 0.19f)),     // a1: rel .829
      (2L, Array(0.99f, 0.141f)),    // a2: rel .802, near-copy of a1
      (3L, Array(0.0f, 1.0f))        // b: rel .70, diverse
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0)
    val out = Similarity.mmrTopK(vecs, q, "vec_id", "embedding",
      k = 2, c = 3, lambdaMilli = 500)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 1L, 2L -> 3L), out.toString)
    // λ=1000 degenerates to plain relevance order: a1 then a2
    val pure = Similarity.mmrTopK(vecs, q, "vec_id", "embedding",
      k = 2, c = 3, lambdaMilli = 1000)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(pure === Map(1L -> 1L, 2L -> 2L), pure.toString)
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(vecs, q, "vec_id", "embedding", k = 5, c = 3)
    }
  }

  test("prfTopK: expansion re-ranks toward the feedback cluster, marks feedback") {
    // raw query q=(1,0): a (cos .95) > c (cos .90) > b (cos .60).
    // fb=1 expands to a; round 2 ranks by cos(a, ·), where b (.82)
    // BEATS c (.72) — the promotion only the expansion can produce
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),       // query
      (1L, Array(0.95f, 0.312f)),    // a: round-1 top, the feedback doc
      (2L, Array(0.6f, 0.8f)),       // b: in a's cluster direction
      (3L, Array(0.9f, -0.436f))     // c: near q but off a's cluster
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0)
    val raw = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Int]("rank")).toMap
    assert(raw(3L) < raw(2L)) // raw query prefers c over b
    val prf = Similarity.prfTopK(vecs, q, "vec_id", "embedding", k = 3, fb = 1)
      .collect().map(r => r.getAs[Long]("cid") ->
        ((r.getAs[Int]("rank"), r.getAs[Boolean]("was_feedback")))).toMap
    assert(prf(1L) === ((1, true)), prf.toString)  // a: cos(a,a)=1, marked
    assert(prf(2L)._1 < prf(3L)._1, prf.toString)  // expansion flips b over c
    assert(!prf(2L)._2 && !prf(3L)._2)
    intercept[IllegalArgumentException] {
      Similarity.prfTopK(vecs, q, "vec_id", "embedding", k = 0)
    }
  }

  test("hardNegatives: closest cross-label vectors only, null labels never pair") {
    // 2-D toy space: anchor (1,0) label A; a nearly-identical same-label
    // vector (must NOT appear), a close different-label vector (the
    // hard negative, must rank 1), a far different-label vector, and a
    // null-label vector that pairs with nothing
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), "A"),    // anchor
      (2L, Array(0.99f, 0.1f), "A"),   // same label: excluded
      (3L, Array(0.95f, 0.3f), "B"),   // hard negative
      (4L, Array(-1.0f, 0.1f), "B"),   // easy negative
      (5L, Array(0.98f, 0.2f), null))  // no label evidence
    val df = rows.toDF("vec_id", "embedding", "label")
    val cents = df.filter($"vec_id" === 1) // one cell: everything co-lives
    val got = Similarity.hardNegatives(df, df.filter($"vec_id" === 1), cents,
        "vec_id", "embedding", "label", k = 3)
      .orderBy($"rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((3L, 1), (4L, 2)))
    // parity with ivfTopK + per-pair label filter applied afterwards
    // (legal here because k covers all candidates)
    val ref = Similarity.ivfTopK(df, df.filter($"vec_id" === 1), cents,
        "vec_id", "embedding", k = 4)
      .join(df.select($"vec_id".as("cid"), $"label".as("cl")), "cid")
      .filter($"cl".isNotNull && $"cl" =!= "A")
      .select($"cid").as[Long].collect().toSet
    assert(got.map(_._1).toSet === ref)
  }

  test("sign-LSH bucket is deterministic and groups identical vectors") {
    val vecs = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val bks = vecs.select(Similarity.signLshBucket($"embedding").as("b"))
      .collect().map(_.getLong(0))
    assert(bks(0) === bks(1))
  }

  test("substring dup stats: repeated 10-gram spans measured, unique docs zero") {
    val span = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 words
    val corpus = Seq(
      (1L, s"one unique lead-in then $span and a distinct tail here"),
      (2L, s"different front matter but $span appears here as well too"),
      (3L, "totally original words that no other document in the corpus shares at all"),
      (4L, "short doc") // < 10 tokens: no grams, absent from stats, kept by filter
    ).toDF("doc_id", "text")
    val stats = Dedup.substringDupStats(corpus, "doc_id", "text", w = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats.keySet === Set(1L, 2L, 3L))
    assert(stats(3L)._2 === 0L)            // nothing duplicated
    assert(stats(1L)._2 >= 1L)             // the shared span is seen
    assert(stats(2L)._2 >= 1L)
    assert(stats(1L)._2 < stats(1L)._1)    // only the span, not the whole doc
    val kept = Dedup.substringDupFilter(corpus, "doc_id", "text",
      w = 10, maxDupFrac = 0.01).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L))           // both dup-span docs dropped; short doc kept
  }

  test("PQ: codes are deterministic in [0,k); ADC top-k finds the co-directional vector") {
    val base = Array.tabulate(64)(d => math.sin(d * 0.37).toFloat)
    val near = base.map(x => x * 2.0f)            // same direction, scaled
    val far = Array.tabulate(64)(d => math.cos(d * 1.13 + 1.0).toFloat)
    val vecs = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 2)
    assert(cbs.length === 4 && cbs.forall(_.length === 2))
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cbs).collect()
    assert(codes.length === 12) // 3 vectors × 4 subspaces
    assert(codes.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 2))
    // identical-direction vectors get identical codes in every subspace
    val byVec = codes.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(byVec(1L) === byVec(2L))
    val top = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding",
      k = 1, cbs).collect()
    assert(top.length === 1 && top.head.getAs[Long]("cid") === 2L)
  }

  test("text functions: counts, quality in [0,1], langid, fingerprint stability") {
    val r = spark.range(1).select(
      TextFunctions.tokenCount(lit("the cat sat")).as("n"),
      TextFunctions.qualityScore(lit("the cat sat on the mat")).as("q"),
      TextFunctions.langId(lit("the cat is in the house of it")).as("l"),
      TextFunctions.fingerprint(lit("abcdefghijklmnop")).as("f1"),
      TextFunctions.fingerprint(lit("abcdefghijklmnop")).as("f2")).collect().head
    assert(r.getAs[Int]("n") === 3)
    val q = r.getAs[Double]("q")
    assert(q >= 0.0 && q <= 1.0)
    assert(r.getAs[String]("l") === "en")
    assert(r.getSeq[Long](3) === r.getSeq[Long](4))
    assert(r.getSeq[Long](3).nonEmpty)
  }

  test("stripMarkup: blocks dropped whole, tags stripped, entities single-unescaped") {
    def strip(s: String): String =
      spark.range(1).select(TextFunctions.stripMarkup(lit(s)).as("t"))
        .collect().head.getString(0)
    assert(strip("<p>hello <b>world</b></p>") === "hello world")
    // script/style/comment bodies vanish entirely, even with tag-like content
    assert(strip("a<script>if (x<y && y>z) {}</script>b") === "a b")
    assert(strip("a<style>p > em { color: red }</style>b") === "a b")
    assert(strip("a<!-- <p>not text</p> -->b") === "a b")
    // entity unescape is single-pass: &amp;lt; -> &lt; (literal), not <
    assert(strip("&amp;lt; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;x") ===
      "&lt; <tag> \"q\" 's' x")
    // whitespace collapse + trim
    assert(strip("  <div>\n a \t b </div>  ") === "a b")
  }

  test("addToIndex: PQ append equals a from-scratch rebuild over the union") {
    import graft.pipeline.Similarity
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") >= 100 && col("vec_id") < 108)
    val cbs = Some(Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8))
    val q = emb.filter(col("vec_id") < 6)
    def results(path: String): Seq[(Long, Long, Int)] =
      Similarity.queryIndex(Similarity.loadIndex(spark, path),
          q, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq.sorted
    val incPath = java.nio.file.Files.createTempDirectory("pq-inc").toString
    Similarity.saveIndex(emb.filter(col("vec_id") % 2 === 0), cents,
      "vec_id", "embedding", incPath, cbs)
    Similarity.addToIndex(emb.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", incPath)
    val fullPath = java.nio.file.Files.createTempDirectory("pq-full").toString
    Similarity.saveIndex(emb, cents, "vec_id", "embedding", fullPath, cbs)
    val inc = results(incPath)
    assert(inc === results(fullPath) && inc.nonEmpty)
  }

  test("appendToDedupIndex: existing band files byte-identical; drops equal one-shot") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val path = java.nio.file.Files.createTempDirectory("dedup-idx-app").toString
    Dedup.saveDedupIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", path, n = 3, numHashes = 16, bands = 4)
    def bandFiles(): Map[String, Array[Byte]] = {
      val root = java.nio.file.Paths.get(s"$path/bands")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString -> java.nio.file.Files.readAllBytes(p))
        .toMap
    }
    val before = bandFiles()
    Dedup.appendToDedupIndex(docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", path)
    val after = bandFiles()
    // the delta lands as NEW files; every pre-append file is untouched
    assert(before.keySet.subsetOf(after.keySet))
    before.foreach { case (f, bytes) =>
      assert(java.util.Arrays.equals(bytes, after(f)), s"rewritten: $f")
    }
    assert(after.size > before.size)
  }

  test("pair reports equal the enumerated relations they summarize (sf0.001)") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")

    // simhash: analytic per-hamming counts == aggregated enumeration
    val enumerated = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 2)
      .groupBy("hamming").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val reported = Dedup.simhashPairStats(corpus, "doc_id", "text", maxHamming = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reported === enumerated)

    // minhash: same per-estimate
    val enumeratedM = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5)
      .groupBy("est_jaccard").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val reportedM = Dedup.minhashPairStats(corpus, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(reportedM === enumeratedM)
  }

  test("length-bucketed batches respect the bucket bound and the row budget") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = graft.pipeline.Curation.lengthBucketedBatches(
      corpus, "doc_id", "text", maxTokensPerBatch = 4096, shards = 4).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val n = r.getAs[Number]("n_tokens").longValue
      val bucket = r.getAs[Number]("bucket").longValue
      assert(n <= bucket, s"doc longer than its bucket: $r")
      assert(bucket < 2 * math.max(n, 16), s"bucket not tight: $r")
    }
    // no batch exceeds its row budget
    a.groupBy(r => (r.getAs[Number]("shard").longValue,
        r.getAs[Number]("bucket").longValue, r.getAs[Number]("batch_id").longValue))
      .foreach { case ((_, bucket, _), rows) =>
        assert(rows.length <= math.max(1, 4096 / bucket).toInt)
      }
  }

  test("soft dedup keeps all singletons, gates dup groups by 1/n") {
    val corpus = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val comp = Dedup.connectedComponents(
      Dedup.simhashEdges(corpus, "doc_id", "text", maxHamming = 2), "id1", "id2")
    val inGroups = comp.select("id").collect().map(_.getLong(0)).toSet
    val kept = Dedup.softDedupSample(corpus, "doc_id", "text", maxHamming = 2)
      .select("doc_id", "dup_count").collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    // singletons (not in any dup group) always survive with dup_count 1
    assert((all -- inGroups).subsetOf(keptIds))
    kept.foreach { r =>
      if (!inGroups.contains(r.getLong(0))) assert(r.getLong(1) === 1L)
      else assert(r.getLong(1) >= 2L)
    }
    // duplicated mass is thinned: fewer survivors than members
    val dupSurvivors = keptIds.intersect(inGroups).size
    assert(dupSurvivors < inGroups.size)
  }

  test("lshThresholdPick: integer cutoff, midpoint eligibility, chosen config") {
    import spark.implicits._
    // synthetic calibration frame, est levels k/16: the 12/16 level is
    // precise (J ~= 0.9), the 8/16 level dilutes the suffix mass below
    // the 4/5 target, so the cutoff must land at k=12
    def calib(rows: (Double, Long, Long, Long)*) =
      rows.toSeq.toDF("est_jaccard", "n_pairs", "sum_inter", "sum_union")
    val c1 = calib(
      (1.0, 2L, 180L, 200L),    // k=16: J=0.90
      (0.75, 4L, 330L, 400L),   // k=12: suffix (>=12): 510/600 = 0.85 >= 0.8
      (0.5, 10L, 300L, 1000L))  // k=8:  suffix 810/1600 = 0.51 < 0.8
    val out1 = Dedup.lshThresholdPick(c1, numHashes = 16, targetNum = 4, targetDen = 5)
      .collect().map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("cutoff_k"), r.getAs[Boolean]("mid_le_cutoff"),
        r.getAs[Boolean]("chosen"))).sortBy(x => (x._1, x._2))
    assert(out1.forall(_._3 === 12L))
    // midpoints: (2,8) t=.917>(12/16=.75); (4,4) t=.707<=.75; (8,2) t=.354
    assert(out1.map(x => (x._1, x._2) -> x._4).toMap ===
      Map((2, 8) -> false, (4, 4) -> true, (8, 2) -> true))
    // chosen = largest midpoint not above the cutoff: (4,4)
    assert(out1.filter(_._5).map(x => (x._1, x._2)).toSeq === Seq((4, 4)))

    // nothing clears the target -> cutoff 17 (accept nothing); every
    // midpoint <= 17/16 so the largest-midpoint config (2,8) wins
    val out2 = Dedup.lshThresholdPick(
      calib((1.0, 2L, 10L, 200L)), numHashes = 16, targetNum = 4, targetDen = 5)
      .collect().map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("cutoff_k"), r.getAs[Boolean]("chosen")))
    assert(out2.forall(_._3 === 17L))
    assert(out2.filter(_._4).map(x => (x._1, x._2)).toSeq === Seq((2, 8)))

    // a cutoff so low every midpoint sits above it -> fallback to the
    // smallest midpoint (8,2)
    val out3 = Dedup.lshThresholdPick(
      calib((0.0625, 4L, 400L, 400L)), numHashes = 16, targetNum = 4, targetDen = 5)
      .collect().map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Long]("cutoff_k"), r.getAs[Boolean]("mid_le_cutoff"),
        r.getAs[Boolean]("chosen")))
    assert(out3.forall(_._3 === 1L))
    assert(out3.forall(!_._4))
    assert(out3.filter(_._5).map(x => (x._1, x._2)).toSeq === Seq((8, 2)))
  }

  test("ever-driver-red rows are hash-invariant under a hostile session config") {
    // z6 (r9+r10) and a11 (r10) went hash-red ONLY on the driver's box;
    // the full-catalog InvarianceSweep measured both bit-stable across
    // every plausible environment axis. Pin the sharpest cell here so a
    // regression reintroducing conf sensitivity (per-FILE bin packing,
    // partition-order float mass) fails in CI, not in a driver round:
    // 200 shuffle partitions + AQE off + forced bucket file splits +
    // interpreted execution must reproduce the baseline hashes exactly.
    val dir = "/root/testdata/sf0.001"
    def sig(name: String, conf: Map[String, String]): (Long, Long, Long) = {
      val s = spark.newSession()
      conf.foreach { case (k, v) => s.conf.set(k, v) }
      // the shared signature implementation — NOT a local re-derivation
      // (review r11: a hand-rolled copy here drifted to a space join)
      val out = graft.Verify.sigOf(graft.Verify.rowHashesOf(
        graft.SparkEntry.queries(name)(s, dir)))
      s.catalog.clearCache()
      out
    }
    val hostile = Map(
      "spark.sql.shuffle.partitions" -> "200",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.files.maxRecordsPerFile" -> "1000",
      "spark.sql.codegen.wholeStage" -> "false")
    Seq("z6_compaction_plan", "a11_session_window").foreach { name =>
      val base = sig(name, Map("spark.sql.shuffle.partitions" -> "32"))
      val hard = sig(name, hostile)
      assert(base === hard, s"$name diverged under the hostile config")
      assert(base._1 > 0, s"$name produced no rows")
    }
  }

  test("timestamp-cutoff rows are hash-invariant under a foreign JVM timezone/locale") {
    // r12: InvarianceSweep's hostile_env axis caught t3b/t9 building
    // their cutoff literals via Timestamp.valueOf — parsed in the JVM
    // DEFAULT timezone, so a non-UTC driver box shifted the cutoff
    // instant and dropped boundary rows (rows 36425→36410 / 9521→9509
    // under America/New_York). The fix constructs the instants
    // timezone-explicitly (Queries.utcTs). Pin the exact cell: the
    // hashes under a New-York JVM default + Turkish locale (the
    // case-mapping trap) must equal the UTC baseline bit-for-bit.
    val dir = "/root/testdata/sf0.001"
    def sig(name: String): (Long, Long, Long) = {
      val s = spark.newSession()
      val out = graft.Verify.sigOf(graft.Verify.rowHashesOf(
        graft.SparkEntry.queries(name)(s, dir)))
      s.catalog.clearCache()
      out
    }
    Seq("t3_state_when_filter", "t9_time_gate").foreach { name =>
      val base = sig(name)
      val prevTz = java.util.TimeZone.getDefault
      val prevLoc = java.util.Locale.getDefault
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      try {
        val foreign = sig(name)
        assert(base === foreign,
          s"$name diverged under a foreign JVM timezone/locale " +
            "(a cutoff literal is riding the JVM default timezone again)")
        assert(base._1 > 0, s"$name produced no rows")
      } finally {
        java.util.TimeZone.setDefault(prevTz)
        java.util.Locale.setDefault(prevLoc)
      }
    }
  }
}
