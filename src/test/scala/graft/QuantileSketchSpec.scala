package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QSketch, QuantileSketch}

/** The mergeable quantile sketch: exact under capacity (any partial
  * order, any partitioning), bounded rank error above it, serialization
  * round-trips — the TypedImperativeAggregate contract end to end.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact tier: under capacity the lower quantile is exact for any partitioning") {
    import spark.implicits._
    val vals = scala.util.Random.shuffle((0 until 1000).toList).map(_.toLong)
    val df = vals.toDF("v").repartition(7)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = df.agg(QuantileSketch.quantileSketch(col("v"), q, k = 2048))
        .collect()(0).getLong(0)
      val expect = vals.sorted.apply(math.floor(q * 999).toInt)
      assert(got === expect, s"q=$q")
    }
  }

  test("null inputs are skipped; empty groups evaluate to null") {
    import spark.implicits._
    val df = Seq(Some(5L), None, Some(1L), None, Some(9L)).toDF("v")
    val r = df.agg(QuantileSketch.quantileSketch(col("v"), 0.5)).collect()(0)
    assert(r.getLong(0) === 5L) // nulls invisible to the rank
    val empty = df.filter(col("v") > 100)
      .agg(QuantileSketch.quantileSketch(col("v"), 0.5)).collect()(0)
    assert(empty.isNullAt(0))
  }

  test("merge of under-capacity partials is order-independent and exact") {
    val vals = (0 until 500).map(i => (i * 2654435761L % 500))
    def sk(chunk: Seq[Long]): QSketch = {
      val s = new QSketch(1024); chunk.foreach(s.add); s
    }
    val chunks = vals.grouped(97).map(_.toSeq).toSeq
    val fwd = sk(Nil)
    chunks.foreach(c => fwd.mergeWith(sk(c)))
    val rev = sk(Nil)
    chunks.reverse.foreach(c => rev.mergeWith(sk(c)))
    val expect = vals.sorted.apply(math.floor(0.5 * 499).toInt)
    assert(fwd.quantile(0.5).get === expect)
    assert(rev.quantile(0.5).get === expect)
  }

  test("approximate tier: bounded rank error after compaction, bounded size") {
    val n = 100000
    val s = new QSketch(1024)
    // deterministic shuffle of 0..n-1 (odd multiplier mod 2^17 > n? use explicit perm)
    (0 until n).map(i => (i.toLong * 99991L) % n).foreach(s.add)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = s.quantile(q).get
      // values are a permutation of 0..n-1, so value == rank
      val err = math.abs(est - q * (n - 1)) / n
      assert(err < 0.05, s"q=$q rank error $err")
    }
    // size stays O(k log(n/k)), not O(n)
    val held = s.heldItems
    assert(held < 8 * 1024, s"sketch holds $held items")
  }

  test("serialize/deserialize round-trips the full structure") {
    val s = new QSketch(64)
    (0 until 1000).foreach(i => s.add((i * 7919L) % 1000))
    val back = QSketch.deserialize(s.serialize)
    assert(back.count === s.count)
    for (q <- Seq(0.25, 0.75)) assert(back.quantile(q) === s.quantile(q))
    // and the restored sketch keeps accepting values / merging
    back.add(12L)
    assert(back.count === s.count + 1)
  }

  test("merge into an empty sketch is the identity on the wire image") {
    // State-store blob stability: partial-aggregation merges must not
    // grow the serialized form with trailing empty levels — the blob a
    // checkpoint persists is the same bytes whether a partial passed
    // through an empty merge buffer or not. Kills the h041
    // `ensureLevel(o.levels.size - 1)` -> `+ 1` over-allocation mutant
    // (quantiles unchanged, wire image padded by two empty levels).
    val o = new QSketch(64)
    (0 until 5000).foreach(i => o.add((i * 104729L) % 4000)) // forces compaction
    val a = new QSketch(64)
    a.mergeWith(o)
    assert(a.count === o.count)
    assert(java.util.Arrays.equals(a.serialize, o.serialize),
      s"merge-into-empty must be wire-identical: ${a.serialize.length}B vs ${o.serialize.length}B")
  }

  test("heavy hitters exact tier: under capacity, counts and merge are exact") {
    import graft.functions.{HHSketch, HeavyHitters => HH}
    val a = new HHSketch(64); val b = new HHSketch(64)
    Seq("x", "x", "y").foreach(a.add(_))
    Seq("x", "z", "z", "z").foreach(b.add(_))
    a.mergeWith(b)
    assert(a.count === 7)
    assert(a.top(10) === Seq(("x", 3L, 0L), ("z", 3L, 0L), ("y", 1L, 0L)))
  }

  test("heavy hitters eviction tier: bounded size, true heavy item present, err bound") {
    import graft.functions.HHSketch
    val k = 16
    val s = new HHSketch(k)
    // one genuinely heavy item among a long tail of distincts
    (0 until 2000).foreach { i =>
      s.add(if (i % 4 == 0) "heavy" else s"tail-$i")
    }
    assert(s.size <= k)
    val top = s.top(k)
    val heavy = top.find(_._1 == "heavy")
    assert(heavy.isDefined, top.toString)
    val (_, c, e) = heavy.get
    // SpaceSaving: trueCount <= reported <= trueCount + err, err <= n/k
    assert(c >= 500 && c - e <= 500, s"count=$c err=$e")
    assert(e <= s.count / k, s"err=$e n=${s.count}")
  }

  test("heavy hitters serialize/deserialize round-trips entries and error terms") {
    import graft.functions.HHSketch
    val s = new HHSketch(8)
    (0 until 100).foreach(i => s.add(s"t-${i % 12}"))
    val back = HHSketch.deserialize(s.serialize)
    assert(back.count === s.count)
    assert(back.top(8) === s.top(8))
    back.add("t-0")
    assert(back.count === s.count + 1)
  }

  // ---- distinct sketch ----------------------------------------------------

  test("distinct sketch exact tier: equals count(DISTINCT) for any partitioning, nulls skipped") {
    import spark.implicits._
    import graft.functions.DistinctSketch
    val df = (0 until 5000).map(i => if (i % 11 == 0) None else Some((i % 700).toLong))
      .toDF("v").repartition(13)
    val got = df.agg(DistinctSketch.distinctCount(col("v"))).collect()(0).getLong(0)
    val expect = df.filter(col("v").isNotNull).select(col("v")).distinct().count()
    assert(got === expect)
  }

  test("distinct sketch merge is order-independent across tiers (exact, degraded, mixed)") {
    import graft.functions.DSketch
    val vals = (0 until 3000).map(i => (i.toLong * 2654435761L) % 2200)
    def sk(chunk: Seq[Long], k: Int): DSketch = {
      val s = new DSketch(k, 12); chunk.foreach(s.add); s
    }
    val chunks = vals.grouped(500).map(_.toSeq).toSeq
    // capacity below the distinct count → every merge order must land
    // on the same degraded register state (registers are a pointwise
    // max over value hashes — a function of the SET only)
    val fwd = sk(Nil, 1000); chunks.foreach(c => fwd.mergeWith(sk(c, 1000)))
    val rev = sk(Nil, 1000); chunks.reverse.foreach(c => rev.mergeWith(sk(c, 1000)))
    assert(!fwd.isExact && fwd.estimate === rev.estimate)
    // capacity above it → exact regardless of order
    val ex = sk(Nil, 4000); chunks.foreach(c => ex.mergeWith(sk(c, 4000)))
    assert(ex.isExact && ex.estimate === vals.distinct.size.toLong)
  }

  test("distinct sketch HLL tier: ~1% relative error at 100k distincts, fixed size") {
    import graft.functions.DSketch
    val s = new DSketch(1024, 14)
    val n = 100000
    (0 until n).foreach(i => s.add(i.toLong * 0x9e3779b97f4a7c15L))
    assert(!s.isExact)
    val err = math.abs(s.estimate - n).toDouble / n
    assert(err < 0.03, s"estimate=${s.estimate} err=$err")
    assert(s.serialize.length <= 1 + 4 + 4 + (1 << 14)) // registers, not values
  }

  test("distinct sketch serialize/deserialize round-trips both tiers") {
    import graft.functions.DSketch
    val ex = new DSketch(100, 12); (0 until 50).foreach(i => ex.add(i * 31L))
    val exBack = DSketch.deserialize(ex.serialize)
    assert(exBack.isExact && exBack.estimate === 50L)
    val hll = new DSketch(100, 12); (0 until 5000).foreach(i => hll.add(i * 31L))
    val hllBack = DSketch.deserialize(hll.serialize)
    assert(!hllBack.isExact && hllBack.estimate === hll.estimate)
    hllBack.mergeWith(exBack) // restored sketches keep merging
    assert(hllBack.estimate >= hll.estimate)
  }

  test("sketch state persists and merges: incremental == one-shot, both tiers") {
    import spark.implicits._
    import graft.functions.DistinctSketch
    // exact tier: state-merge must equal the one-shot EXACT count
    val a = (0 until 400).map(i => (i * 7L) % 500).toDF("v")
    val b = (0 until 400).map(i => (i * 11L + 3) % 500).toDF("v")
    val stA = a.agg(DistinctSketch.sketchState(col("v"), k = 2048).as("sketch"))
    val stB = b.agg(DistinctSketch.sketchState(col("v"), k = 2048).as("sketch"))
    val merged = stA.unionAll(stB)
      .agg(DistinctSketch.mergeSketches(col("sketch"))).collect()(0).getLong(0)
    val exact = a.unionAll(b).distinct().count()
    assert(merged === exact)
    // HLL tier: state-merge must equal the one-shot sketch ESTIMATE
    // (register-max is merge-order independent)
    val big1 = (0 until 30000).map(i => i * 13L).toDF("v")
    val big2 = (15000 until 45000).map(i => i * 13L).toDF("v")
    val inc = big1.agg(DistinctSketch.sketchState(col("v"), k = 1024).as("sketch"))
      .unionAll(big2.agg(DistinctSketch.sketchState(col("v"), k = 1024).as("sketch")))
      .agg(DistinctSketch.mergeSketches(col("sketch"))).collect()(0).getLong(0)
    val oneShot = big1.unionAll(big2)
      .agg(DistinctSketch.distinctCount(col("v"), k = 1024)).collect()(0).getLong(0)
    assert(inc === oneShot)
    // and the estimate is sane for the true 45000-distinct union
    assert(math.abs(inc - 45000.0) / 45000.0 < 0.03)
  }

  test("SQL surface: graft_distinct_sketch coerces an int column at analysis") {
    import spark.implicits._
    (1 to 100).map(i => i % 40).toDF("v").createOrReplaceTempView("dsk_t")
    val r = spark.sql("SELECT graft_distinct_sketch(v) FROM dsk_t").collect()(0)
    assert(r.getLong(0) === 40L)
    // the quantile/heavy-hitter aggregates coerce the same way now
    val q = spark.sql("SELECT graft_quantile_sketch(v, 0.5) FROM dsk_t").collect()(0)
    // (1..100) % 40 sorted: 0×2, then 1..20 ×3, 21..39 ×2 — the lower
    // median (rank 49, 0-indexed) falls in value 16's run (ranks 47-49)
    assert(q.getLong(0) === 16L)
  }
}
