package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.GraphOps

/** PageRank semantics: stochastic invariant, exact fixed points, dangling
  * redistribution, weight sensitivity, lineage truncation. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (Long, Long, Double)*) =
    rows.toSeq.toDF("src", "dst", "w")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle is the uniform fixed point") {
    val pr = ranks(GraphOps.pageRank(edges((1L, 2L, 1.0), (2L, 1L, 1.0)), iters = 5))
    assert(pr.keySet == Set(1L, 2L))
    assert(math.abs(pr(1L) - 0.5) < 1e-12 && math.abs(pr(2L) - 0.5) < 1e-12)
  }

  test("total rank is exactly 1 even with dangling nodes") {
    // 3 -> sink 4; 1<->2 cycle; 4 dangles
    val pr = ranks(GraphOps.pageRank(
      edges((1L, 2L, 1.0), (2L, 1L, 1.0), (3L, 4L, 1.0)), iters = 4))
    assert(pr.size == 4)
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, pr.toString)
    // the sink receives 3's full rank each step: strictly above its source
    assert(pr(4L) > pr(3L))
  }

  test("edge weights steer rank: heavier in-edge wins") {
    // hub 1 links 2 (w=9) and 3 (w=1): 2 must outrank 3
    val pr = ranks(GraphOps.pageRank(
      edges((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)), iters = 6))
    assert(pr(2L) > pr(3L))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("parallel edges sum their weights") {
    val a = ranks(GraphOps.pageRank(
      edges((1L, 2L, 1.0), (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)),
      iters = 4))
    val b = ranks(GraphOps.pageRank(
      edges((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)), iters = 4))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"node $k") }
  }

  test("checkpointEvery truncates lineage without changing the answer") {
    val e = edges((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), (1L, 3L, 2.0))
    val plain = ranks(GraphOps.pageRank(e, iters = 6))
    val ckpt = ranks(GraphOps.pageRank(e, iters = 6, checkpointEvery = 2))
    plain.foreach { case (k, v) => assert(math.abs(v - ckpt(k)) < 1e-12, s"node $k") }
  }

  test("personalized pagerank: mass stays near seeds, unreachable nodes get 0") {
    // two disconnected cycles: {1,2} and {3,4}; seed = 1
    val e = edges((1L, 2L, 1.0), (2L, 1L, 1.0), (3L, 4L, 1.0), (4L, 3L, 1.0))
    val seeds = Seq(1L).toDF("id")
    // 2-cycle mass oscillates with decay 0.85^k — run to near-convergence
    // (limit: seed 0.5405 vs 0.4595)
    val pr = ranks(GraphOps.personalizedPageRank(e, seeds, iters = 20,
      checkpointEvery = 5))
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(3L) == 0.0 && pr(4L) == 0.0) // exactly: no baseline teleport
    assert(pr(1L) > pr(2L)) // teleport favors the seed itself
  }

  test("personalized == uniform when every node is a seed") {
    val e = edges((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 2.0), (1L, 3L, 1.0))
    val all = Seq(1L, 2L, 3L).toDF("id")
    val ppr = ranks(GraphOps.personalizedPageRank(e, all, iters = 4))
    val upr = ranks(GraphOps.pageRank(e, iters = 4))
    upr.foreach { case (k, v) => assert(math.abs(v - ppr(k)) < 1e-12, s"node $k") }
  }

  test("hits: pure hub and pure authority separate; scores L1-normalized") {
    // 1 and 2 both point at 3: 3 is the only authority; 1,2 are hubs
    val out = GraphOps.hits(edges((1L, 3L, 1.0), (2L, 3L, 1.0)), iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-9) // hubs sum 1
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9) // auths sum 1
    assert(out(3L)._2 == 1.0 && out(3L)._1 == 0.0) // pure authority
    assert(out(1L)._1 == 0.5 && out(1L)._2 == 0.0) // symmetric pure hubs
    assert(out(2L)._1 == 0.5)
  }

  test("labelPropagation: two communities converge to their min label, bridge stays put") {
    // triangles {1,2,3} and {10,11,12} joined by one weak bridge 3-10;
    // after 3 synchronous rounds each triangle speaks its min label
    val lbl = GraphOps.labelPropagation(edges(
        (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
        (10L, 11L, 1.0), (11L, 12L, 1.0), (12L, 10L, 1.0),
        (3L, 10L, 1.0)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(1L, 2L, 3L).forall(n => lbl(n) === 1L), lbl.toString)
    assert(Set(10L, 11L, 12L).forall(n => lbl(n) <= 3L || lbl(n) === 10L), lbl.toString)
    // determinism: identical result from a different partitioning
    val again = GraphOps.labelPropagation(edges(
        (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
        (10L, 11L, 1.0), (11L, 12L, 1.0), (12L, 10L, 1.0),
        (3L, 10L, 1.0)).repartition(13), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === lbl)
  }

  test("labelPropagation: weight beats count, ties go to the smaller label") {
    // node 5 hears label 1 with mass 3 and label 2 with mass 2+2=4:
    // the heavier mass wins even with fewer edges
    val lbl = GraphOps.labelPropagation(edges(
        (1L, 5L, 3.0), (2L, 5L, 2.0), (2L, 5L, 2.0)), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(5L) === 2L, lbl.toString)
    // exact tie: 1 and 2 each vote with mass 3 -> min label 1 wins
    val tie = GraphOps.labelPropagation(edges(
        (1L, 6L, 3.0), (2L, 6L, 3.0)), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tie(6L) === 1L, tie.toString)
  }

  test("triangleCount: shared-edge triangles, each counted once per node") {
    // triangles {1,2,3} and {2,3,4} share edge 2-3; 4-5 dangles
    val tri = GraphOps.triangleCount(edges(
      (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
      (2L, 4L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), tri.toString)
  }

  test("triangleCount: self-loops, duplicates, and reversed edges collapse") {
    val tri = GraphOps.triangleCount(edges(
      (1L, 1L, 1.0), // self-loop ignored
      (1L, 2L, 1.0), (2L, 1L, 1.0), (1L, 2L, 1.0), // one undirected edge
      (2L, 3L, 1.0), (1L, 3L, 1.0)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L, 2L -> 1L, 3L -> 1L), tri.toString)
    // a star has wedges but no closing edge → empty result
    assert(GraphOps.triangleCount(edges(
      (9L, 1L, 1.0), (9L, 2L, 1.0), (9L, 3L, 1.0), (9L, 4L, 1.0))).count() === 0L)
  }

  test("triangleCount: K5 complete graph — every node in C(4,2)=6 triangles") {
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b, 1.0)
    val tri = GraphOps.triangleCount(edges(k5: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === (1L to 5L).map(_ -> 6L).toMap, tri.toString)
  }

  test("transitionEdges: per-key consecutive pairs, tie-broken, counted") {
    val ev = Seq(
      (10L, 1L, "2024-01-01 00:00:00", 1L),
      (10L, 2L, "2024-01-01 00:00:01", 2L),
      (10L, 1L, "2024-01-01 00:00:02", 3L),
      (10L, 2L, "2024-01-01 00:00:03", 4L),
      (20L, 5L, "2024-01-01 00:00:00", 5L)
    ).toDF("user_id", "page", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val e = GraphOps.transitionEdges(ev, "user_id", col("page"), "ts",
      tieCols = Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // user 10: 1→2, 2→1, 1→2 ; user 20 contributes nothing (single event)
    assert(e == Map((1L, 2L) -> 2.0, (2L, 1L) -> 1.0))
  }

  test("kCore: pendants peel off a clique, chains cascade to nothing, idle rounds are free") {
    import spark.implicits._
    // K4 on 1..4 plus a pendant 5-1
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong))
    val g = (k4 :+ (5L, 1L)).toDF("src", "dst")
    val core = GraphOps.kCore(g, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the pendant (degree 1) dies in round 1; the K4 core survives
    // with its in-subgraph degree 3 — node 1's raw degree 4 is the
    // over-count k-core exists to correct
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // extra rounds that remove nothing change nothing
    val more = GraphOps.kCore(g, k = 3, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more === core)
    // a chain has no 2-core: the ends peel first, the cascade empties
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(GraphOps.kCore(chain, k = 2, rounds = 3).count() === 0L)
    // bounded rounds stop mid-cascade: after ONE round only the chain
    // ends are gone (deterministic replay is the oracle contract)
    val one = GraphOps.kCore(chain, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    // duplicate / reversed / self-loop edges collapse before peeling
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)).toDF("src", "dst")
    assert(GraphOps.kCore(messy, k = 1, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 1L))
    intercept[IllegalArgumentException] { GraphOps.kCore(g, k = 0, rounds = 1) }
    intercept[IllegalArgumentException] { GraphOps.kCore(g, k = 1, rounds = 0) }
  }

  test("modularity: true communities score the textbook Q, singletons negative") {
    // two triangles bridged by one edge — the canonical Q = 5/14 case:
    // W2 = 14, each triangle in_c = 6, deg_c = 7 ->
    // contrib = (6*14 - 49)*1e6 div 196 = 178,571 each; Q = 357,142
    val g = edges((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0), (3L, 4L, 1.0))
    val truth = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "lbl")
    val out = GraphOps.modularity(g, truth)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out(1L) === ((3L, 6L, 7L, 178571L, 357142L)), out.toString)
    assert(out(4L) === ((3L, 6L, 7L, 178571L, 357142L)), out.toString)
    // the singleton partition on the same graph scores negative: no
    // in-community mass anywhere, only the degree penalty
    val singles = (1L to 6L).map(i => (i, i)).toDF("id", "lbl")
    val q = GraphOps.modularity(g, singles)
      .select("q_micro").distinct().as[Long].head()
    assert(q < 0L, q.toString)
    // LPA on this graph finds the triangles -> same positive Q
    val lpaQ = GraphOps.modularity(g, GraphOps.labelPropagation(g, iters = 3))
      .select("q_micro").distinct().as[Long].head()
    assert(lpaQ === 357142L, lpaQ.toString)
  }
}
