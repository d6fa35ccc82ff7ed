package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CMSketch, CountMin}

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ph(s: String): (Long, Long) = CMSketch.hashPair(UTF8String.fromString(s))

  test("estimate is never below the true count (upper-bound contract)") {
    val prop = Prop.forAll(Gen.listOf(Gen.chooseNum(0, 50))) { xs =>
      val s = new CMSketch(64, 4) // small width to force collisions
      xs.foreach(x => s.add(ph(x.toString)._1, ph(x.toString)._2))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong)
      truth.forall { case (x, c) => s.estimate(ph(x.toString)._1, ph(x.toString)._2) >= c }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("merge is elementwise addition: any split equals single-pass") {
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0, 200))
      cut <- Gen.chooseNum(0, math.max(xs.size, 1))
    } yield (xs, cut)
    val prop = Prop.forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(math.min(cut, xs.size))
      val a = new CMSketch(256, 3); val b = new CMSketch(256, 3)
      val whole = new CMSketch(256, 3)
      l.foreach(x => a.add(ph(x.toString)._1, ph(x.toString)._2))
      r.foreach(x => b.add(ph(x.toString)._1, ph(x.toString)._2))
      xs.foreach(x => whole.add(ph(x.toString)._1, ph(x.toString)._2))
      b.mergeWith(a) // reversed merge order on purpose
      (0 to 200).forall(x => b.estimate(ph(x.toString)._1, ph(x.toString)._2) == whole.estimate(ph(x.toString)._1, ph(x.toString)._2)) &&
        b.count == whole.count
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.toString)
  }

  test("bucket layout is a WIRE contract: K-M row positions pinned (mutation h001)") {
    // Persisted sketches (the d15/d16 saved-index pattern) merge
    // across sessions: two engine versions disagreeing on bucket()
    // silently corrupt merged estimates while every per-version
    // property (upper bound, merge additivity) still passes — exactly
    // how auto-mutant h001 (multiplier i+1 -> i-1) survived the gate.
    // Pin the documented Kirsch–Mitzenmacher scheme
    // (CountMin.scala:42-55): row-i bucket =
    // avalanche(h1 + (i+1)*h2) >>> 17 masked to width, recomputed here
    // from the doc formula, independently of the implementation.
    val (w, d) = (1024, 5)
    val s = new CMSketch(w, d)
    val items = Seq("alpha", "beta", "graft")
    items.foreach { it => val (h1, h2) = ph(it); s.add(h1, h2) }
    val buf = java.nio.ByteBuffer.wrap(s.serialize)
    assert(buf.getInt === w && buf.getInt === d && buf.getLong === items.size.toLong)
    val rows = Array.fill(d)(Array.fill(w)(buf.getLong))
    def kmBucket(h1: Long, h2: Long, i: Int): Int = {
      var m = h1 + (i + 1).toLong * h2
      m = (m ^ (m >>> 30)) * 0xbf58476d1ce4e5b9L
      ((m >>> 17) & (w - 1)).toInt
    }
    for (it <- items; i <- 0 until d) {
      val (h1, h2) = ph(it)
      assert(rows(i)(kmBucket(h1, h2, i)) >= 1L,
        s"row $i counter for '$it' not at the K-M bucket — wire layout drifted")
    }
    // each add increments exactly one counter per row
    rows.foreach(r => assert(r.sum === items.size.toLong))
  }

  test("serialization round-trips") {
    val s = new CMSketch(128, 4)
    (1 to 500).foreach { x => val h = ph((x % 37).toString); s.add(h._1, h._2) }
    val back = CMSketch.deserialize(s.serialize)
    assert(back.count === s.count)
    (0 to 40).foreach(x =>
      assert(back.estimate(ph(x.toString)._1, ph(x.toString)._2) === s.estimate(ph(x.toString)._1, ph(x.toString)._2)))
  }

  test("DataFrame aggregate: exact estimates at ample width") {
    val rows = Seq.fill(30)("a") ++ Seq.fill(7)("b") ++ Seq.fill(1)("c") ++
      (1 to 100).map(i => s"noise$i")
    val got = rows.toDF("tok")
      .agg(CountMin.countMinEstimates($"tok", Seq("a", "b", "c", "zzz")).as("e"))
      .collect().head.getSeq[Long](0)
    assert(got === Seq(30L, 7L, 1L, 0L))
  }

  test("width must be a power of two") {
    intercept[IllegalArgumentException] { new CMSketch(100, 4) }
  }
}
