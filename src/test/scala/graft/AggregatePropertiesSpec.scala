package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BKSample, PolyHash, TKState}

/** Property tests for the mergeable bounded-heap aggregates: the
  * distributed-correctness contract is that ANY partitioning of the
  * input into partial buffers, merged in ANY order, yields the same
  * members as a single-pass build — that is what makes the map-side
  * partial + shuffle-merge plan exact, not approximate.
  */
class AggregatePropertiesSpec extends AnyFunSuite {

  private def ph(id: Long): Long = PolyHash.hash(UTF8String.fromString(id.toString))

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("BKSample: any split + merge order equals the single-pass build") {
    val gen = for {
      ids <- Gen.listOf(Gen.chooseNum(0L, 500L))
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, math.max(ids.size, 1))
      bFirst <- Gen.oneOf(true, false)
    } yield (ids, k, cut, bFirst)
    check("bk-merge", Prop.forAll(gen) { case (ids, k, cut, bFirst) =>
      val (l, r) = ids.splitAt(math.min(cut, ids.size))
      val a = new BKSample(k); val b = new BKSample(k); val whole = new BKSample(k)
      l.foreach(id => a.add(ph(id), id)); r.foreach(id => b.add(ph(id), id))
      ids.foreach(id => whole.add(ph(id), id))
      val merged = if (bFirst) { b.mergeWith(a); b } else { a.mergeWith(b); a }
      merged.members.toSeq == whole.members.toSeq
    })
  }

  test("BKSample: members are exactly the k smallest (hash, id) pairs") {
    val gen = for {
      ids <- Gen.listOf(Gen.chooseNum(0L, 300L))
      k <- Gen.chooseNum(1, 10)
    } yield (ids, k)
    check("bk-exact", Prop.forAll(gen) { case (ids, k) =>
      val s = new BKSample(k)
      ids.foreach(id => s.add(ph(id), id))
      val expected = ids.map(id => (ph(id), id)).sorted.take(k).map(_._2)
      s.members.toSeq == expected
    })
  }

  test("TKState: any split + merge order equals the single-pass build") {
    val gen = for {
      rows <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 300L)))
      k <- Gen.chooseNum(1, 12)
      cut <- Gen.chooseNum(0, math.max(rows.size, 1))
      bFirst <- Gen.oneOf(true, false)
    } yield (rows, k, cut, bFirst)
    check("tk-merge", Prop.forAll(gen) { case (rows, k, cut, bFirst) =>
      val (l, r) = rows.splitAt(math.min(cut, rows.size))
      val a = new TKState(k); val b = new TKState(k); val whole = new TKState(k)
      l.foreach { case (s, id) => a.add(s, id) }
      r.foreach { case (s, id) => b.add(s, id) }
      rows.foreach { case (s, id) => whole.add(s, id) }
      val merged = if (bFirst) { b.mergeWith(a); b } else { a.mergeWith(b); a }
      merged.members.toSeq == whole.members.toSeq
    })
  }

  test("TKState: members are the k best by (score desc, id asc), duplicates kept") {
    val gen = for {
      rows <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 50L)))
      k <- Gen.chooseNum(1, 10)
    } yield (rows, k)
    check("tk-exact", Prop.forAll(gen) { case (rows, k) =>
      val s = new TKState(k)
      rows.foreach { case (sc, id) => s.add(sc, id) }
      val expected = rows.sortBy { case (sc, id) => (-sc, id) }.take(k)
      s.members.toSeq == expected
    })
  }

  test("funnel: greedy ts-ordered fold equals the min-time chain (random events)") {
    // the equivalence both funnel gates rely on: the batch operator
    // computes t_k = min(ts of stage-k events with ts > t_{k-1}), the
    // stream folds greedily in ts order — same answer on any input
    val stages = Vector("a", "b", "c")
    def chain(evs: List[(Long, String)]): Int = {
      var prev = Option.empty[Long]
      var reached = 0
      var continue = true
      stages.foreach { st =>
        if (continue) {
          val cand = evs.filter { case (t, s) =>
            s == st && prev.forall(t > _)
          }.map(_._1)
          if (cand.isEmpty) continue = false
          else { prev = Some(cand.min); reached += 1 }
        }
      }
      reached
    }
    def greedy(evs: List[(Long, String)]): Int = {
      var reached = 0; var at = Long.MinValue
      evs.sortBy(_._1).foreach { case (t, s) =>
        if (reached < stages.size && s == stages(reached) &&
            (reached == 0 || t > at)) { reached += 1; at = t }
      }
      reached
    }
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 30L), Gen.oneOf("a", "b", "c", "x")))
    check("funnel-equiv", Prop.forAll(gen) { evs =>
      chain(evs) == greedy(evs)
    })
  }

  test("serialization round-trip preserves members (both heaps)") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 400L))
    check("serde", Prop.forAll(gen) { ids =>
      val bk = new BKSample(7); val tk = new TKState(7)
      ids.foreach { id => bk.add(ph(id), id); tk.add(id % 9, id) }
      BKSample.deserialize(bk.serialize).members.toSeq == bk.members.toSeq &&
        TKState.deserialize(tk.serialize).members.toSeq == tk.members.toSeq
    })
  }

  test("DSketch exact tier (primitive LongSet): arbitrary adds match a reference Set") {
    // exercises the round-8 open-addressing long set through its only
    // consumer: zero values, duplicates, negatives, growth past the
    // initial table, split+merge, and the canonical serialized image
    val gen = for {
      vals <- Gen.listOf(Gen.oneOf(Gen.chooseNum(-50L, 50L), Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      cut <- Gen.chooseNum(0, math.max(vals.size, 1))
    } yield (vals, cut)
    check("dsketch-longset", org.scalacheck.Prop.forAll(gen) { case (vals, cut) =>
      val ref = vals.toSet
      val k = math.max(1, ref.size + 8) // stay in the exact tier
      val whole = new graft.functions.DSketch(k, 12)
      vals.foreach(whole.add)
      val (l, r) = vals.splitAt(math.min(cut, vals.size))
      val a = new graft.functions.DSketch(k, 12)
      val b = new graft.functions.DSketch(k, 12)
      l.foreach(a.add); r.foreach(b.add)
      a.mergeWith(b)
      // round-trip through the UNSORTED wire form (r16): bytes are
      // insertion-order dependent, but the SET they carry is not —
      // the canonical image after any serde/merge history must match
      val rt = graft.functions.DSketch.deserialize(whole.serialize)
      whole.estimate == ref.size.toLong &&
        a.estimate == ref.size.toLong &&
        rt.estimate == ref.size.toLong &&
        java.util.Arrays.equals(whole.canonicalSerialize, a.canonicalSerialize) &&
        java.util.Arrays.equals(whole.canonicalSerialize, rt.canonicalSerialize) &&
        java.util.Arrays.equals(whole.canonicalSerialize,
          graft.functions.DSketch.deserialize(a.serialize).canonicalSerialize)
    })
  }

  test("CUSUM closed form == the literal clamped recursion on random paths") {
    // the batch cusum computes S_i = max(0, S_{i-1} + d_i) as
    // C_i − min(0, min_{j≤i} C_j) on running windows; the streaming
    // twin runs the same identity incrementally. Pin the identity
    // itself against the textbook recursion for arbitrary paths.
    val gen = Gen.listOf(Gen.chooseNum(-1000L, 1000L))
    check("cusum-closed-form", Prop.forAll(gen) { ds =>
      var s = 0L // textbook recursion
      val rec = ds.map { d => s = math.max(0L, s + d); s }
      var c = 0L
      var minC = 0L // min over prefix INCLUDING current, clamped at 0
      val closed = ds.map { d =>
        c += d
        if (c < minC) minC = c
        c - math.min(minC, 0L)
      }
      rec == closed
    })
  }

  test("MMR greedy column expression == a reference Scala fold") {
    // random candidate pools: relevances + symmetric similarity
    // matrices; the nested-HOF selection in Similarity.mmrTopK must
    // match the straightforward reference greedy, including the
    // first-maximum (lowest-position) tie break
    def refGreedy(rels: Array[Long], sim: Array[Array[Long]],
        k: Int, lam: Long): Seq[Int] = {
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (picked.size < math.min(k, rels.length)) {
        var bestScore = Long.MinValue
        var bestP = -1
        for (p <- rels.indices if !picked.contains(p)) {
          val pen = if (picked.isEmpty) 0L else picked.map(q => sim(p)(q)).max
          val score = lam * rels(p) - (1000 - lam) * pen
          if (score > bestScore) { bestScore = score; bestP = p }
        }
        picked += bestP
      }
      picked.toSeq
    }
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 6)
      rels <- Gen.listOfN(n, Gen.chooseNum(-500L, 500L))
      flat <- Gen.listOfN(n * n, Gen.chooseNum(-500L, 500L))
      k <- Gen.chooseNum(1, 4)
      lam <- Gen.oneOf(0L, 300L, 700L, 1000L)
    } yield (rels.toArray, flat.toArray, k, lam)
    check("mmr-greedy", Prop.forAllNoShrink(gen) { case (rels, flat, k, lam) =>
      val n = rels.length
      // symmetrize so sim(p)(q) == sim(q)(p) like real dot products
      val sim = Array.tabulate(n, n)((i, j) =>
        flat(math.min(i, j) * n + math.max(i, j)))
      val simflat = (for (p <- 0 until n; q <- 0 until n) yield sim(p)(q))
      val df = Seq((rels.toSeq, simflat, n)).toDF("rels", "simflat", "_nc")
      val picked = df.withColumn("picked",
        org.apache.spark.sql.functions.expr(
          graft.pipeline.Similarity.mmrFoldSql(k, lam.toInt)))
        .select("picked").as[Seq[Int]].head()
      picked.map(_ - 1) == refGreedy(rels, sim, k, lam)
    })
  }

  test("funnel fold == reference frontier-chain semantics on random event streams") {
    // the r10 single-exchange fold replaced the frontier-join chain; pin
    // the fold's semantics against a direct Scala transcription of the
    // chain definition: t_0 = min ts of stage-0 events, t_k = min ts of
    // stage-k events STRICTLY after t_{k-1} (and <= t_{k-1} + W windowed)
    def refReach(evs: Seq[(Long, Int)], nStages: Int, win: Option[Long]): Seq[Option[Long]] =
      (0 until nStages).foldLeft(Seq.empty[Option[Long]]) { (acc, k) =>
        val prev = if (k == 0) Some(Long.MinValue) else acc.last.map(identity)
        val t = prev.flatMap { p =>
          val cands = evs.collect { case (ts, ty) if ty == k &&
            (k == 0 || (ts > p && win.forall(w => ts <= p + w))) => ts }
          if (cands.isEmpty) None else Some(cands.min)
        }
        acc :+ t
      }
    val spark = TestSpark.spark
    import spark.implicits._
    val stageNames = Seq("s0", "s1", "s2", "s3")
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      evs <- Gen.listOfN(n, for {
        ts <- Gen.chooseNum(0L, 20L) // tight domain → plenty of ties
        ty <- Gen.chooseNum(0, 3)
      } yield (ts, ty))
      nStages <- Gen.chooseNum(2, 4)
      win <- Gen.oneOf(None, Some(3L), Some(8L))
    } yield (evs, nStages, win)
    check("funnel-fold", Prop.forAllNoShrink(gen) { case (evs, nStages, win) =>
      val stages = stageNames.take(nStages)
      // gen ts is MILLISECONDS (Timestamp(ms)); refReach and withinUs work in µs
      val df = (evs.zipWithIndex.map { case ((ts, ty), i) =>
        (1L, new java.sql.Timestamp(ts), stageNames(ty), i.toLong)
      } :+ ((2L, new java.sql.Timestamp(0L), "s0", 999L))) // second user: engine never degenerates to 0 groups
        .toDF("user_id", "ts", "event_type", "event_id")
      val counts = graft.operators.EventAnalytics
        .funnel(df, "user_id", "event_type", "ts", stages, win.map(_ * 1000L))
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      val reach1 = refReach(evs.map { case (ts, ty) => (ts * 1000L, ty) }, nStages,
        win.map(_ * 1000L))
      // user 2 contributes one s0 reach; user 1 contributes per the reference
      val want = (1 to nStages).map(k =>
        k -> ((if (reach1(k - 1).isDefined) 1L else 0L) + (if (k == 1) 1L else 0L))).toMap
      counts == want
    })
  }

  test("funnel skew guard: one hot user at 1e5 in-stage events folds a bounded candidate set") {
    // r10 verdict task 4: the per-user collect_list was unbounded under
    // a hot key — one user spamming one stage materialized its whole
    // history in a single hash-agg array. funnelCandidates' dominance
    // prefilter must collapse the spam run (only the first stage-k
    // event after each stage-(k-1) event can ever be the fold's pick)
    // while leaving the funnel result EXACT.
    val spark = TestSpark.spark
    import spark.implicits._
    val hot = (0 until 100000).map(i =>
      (1L, "view", new java.sql.Timestamp(2000L + i))) // 1e5-event view spam
    val evs = hot ++ Seq(
      (1L, "signup", new java.sql.Timestamp(1000L)),  // before the spam
      (1L, "click", new java.sql.Timestamp(200000L)), // strictly after a view
      (2L, "signup", new java.sql.Timestamp(0L)))
    val df = evs.toDF("user_id", "event_type", "ts")
    val stages = Seq("signup", "view", "click")
    // the guarded candidate set is O(alternations), not O(events): the
    // spam run keeps only its first event after the lone signup
    val nCand = graft.operators.EventAnalytics
      .funnelCandidates(df, "user_id", "event_type", "ts", stages).count()
    assert(nCand <= 10L, s"guard kept $nCand of ${evs.size} events")
    // and the result is the exact chain: u1 converts all three stages
    val counts = graft.operators.EventAnalytics
      .funnel(df, "user_id", "event_type", "ts", stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts === Map("signup" -> 2L, "view" -> 1L, "click" -> 1L))
  }

  test("funnel skew guard worst case: strict alternation prunes little but stays exact") {
    // the guard's documented adversarial bound — alternating a,b,a,b…
    // keeps slot-0's single first event plus EVERY b (each b is the
    // first b after some a), so pruning degrades to O(alternations);
    // what must never degrade is exactness
    val spark = TestSpark.spark
    import spark.implicits._
    val n = 2000
    val evs = (1 to n).map(i =>
      (1L, if (i % 2 == 1) "a" else "b", new java.sql.Timestamp(i.toLong)))
    val df = evs.toDF("user_id", "event_type", "ts")
    val nCand = graft.operators.EventAnalytics
      .funnelCandidates(df, "user_id", "event_type", "ts", Seq("a", "b")).count()
    assert(nCand === 1L + n / 2, s"expected 1 + ${n / 2} candidates, got $nCand")
    val counts = graft.operators.EventAnalytics
      .funnel(df, "user_id", "event_type", "ts", Seq("a", "b"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts === Map("a" -> 1L, "b" -> 1L))
  }

  test("funnel with a repeated stage name fills every matching slot (advisor r10)") {
    // stages = [view, click, view]: the old nested-when type→index map
    // resolved 'view' only to the LAST index, so slot 0 never filled and
    // the funnel silently reported zero conversions everywhere
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, "view", new java.sql.Timestamp(1000L)),
      (1L, "click", new java.sql.Timestamp(2000L)),
      (1L, "view", new java.sql.Timestamp(3000L)),
      (2L, "view", new java.sql.Timestamp(1000L)),
      (2L, "click", new java.sql.Timestamp(2000L))) // no second view
      .toDF("user_id", "event_type", "ts")
    val rows = graft.operators.EventAnalytics
      .funnel(df, "user_id", "event_type", "ts", Seq("view", "click", "view"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(rows === Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("MMR argmax can never fall through to the sentinel (score underflow)") {
    // every candidate score below the old -2^62 seed: pos=-1 would have
    // leaked into element_at, silently selecting the LAST candidate
    // (negative indices count from the end) — the b.pos = -1 disjunct
    // makes the FIRST unpicked candidate win instead (ADVICE r9)
    val spark = TestSpark.spark
    import spark.implicits._
    val rels = Seq(-4611686018427388L, -4611686018427389L, -4611686018427390L)
    val simflat = Seq.fill(9)(0L)
    val df = Seq((rels, simflat, 3)).toDF("rels", "simflat", "_nc")
    val picked = df.withColumn("picked",
      org.apache.spark.sql.functions.expr(
        graft.pipeline.Similarity.mmrFoldSql(2, 1000)))
      .select("picked").as[Seq[Int]].head()
    // greedy on pure relevance: position 1 (best rel), then 2
    assert(picked == Seq(1, 2), picked.toString)
  }
}
