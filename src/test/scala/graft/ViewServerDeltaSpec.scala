package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ChannelSpec
import graft.operators.{ViewConfig, Views}
import graft.sinks.ViewServer
import graft.streaming.ChannelRuntime

/** Incremental view maintenance (round-8 task): the delta path must
  * produce EXACTLY the snapshot the full recompute produces, tick
  * after tick, for every non-aggregating view shape — and aggregate
  * views must skip recomputation when nothing ticked.
  */
class ViewServerDeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rtSchema = StructType(Seq(
    StructField("id", StringType), StructField("timestamp", TimestampType),
    StructField("k", StringType), StructField("cat", StringType),
    StructField("x", LongType)))

  private def withRuntime(f: ChannelRuntime => Unit): Unit = {
    val rt = new ChannelRuntime(spark,
      Map("ch" -> ChannelSpec("ch", rtSchema, stateKeyby = Seq("k"))),
      Files.createTempDirectory("graft-vsd-ckpt").toString)
    rt.start()
    try f(rt) finally rt.stop()
  }

  /** The full-recompute oracle: same code path refreshFull uses,
    * including the ring-buffer cap on un-self-bounded views. */
  private def fullSnapshot(rt: ChannelRuntime, v: ViewConfig, cap: Int): Seq[Row] = {
    val raw = rt.stateFrame("ch")
    val bounded =
      if (v.limit.nonEmpty || v.index.nonEmpty || v.groupBy.nonEmpty || v.aggregates.nonEmpty) raw
      else raw.orderBy(col(ChannelRuntime.SeqCol).desc).limit(cap)
    Views.compile(bounded, v, seqCol = Some(ChannelRuntime.SeqCol)).collect().toSeq
  }

  private def assertParity(rt: ChannelRuntime, vs: ViewServer,
      views: Map[String, ViewConfig], cap: Int, tickLabel: String): Unit = {
    vs.refresh()
    views.foreach { case (name, cfg) =>
      val expect = fullSnapshot(rt, cfg, cap)
      val got = vs.snapshot(name)
      // sorted views compare ordered; unsorted compare as multisets
      if (cfg.sort.nonEmpty)
        assert(got.map(_.toSeq) === expect.map(_.toSeq), s"$name after $tickLabel")
      else
        assert(got.map(_.toSeq).sortBy(_.toString) === expect.map(_.toSeq).sortBy(_.toString),
          s"$name after $tickLabel")
      // schema parity too (Arrow encoding depends on it)
      val gotSchema = vs.snapshotWithSchema(name).get._2
      assert(gotSchema.fieldNames.toSeq ===
        Views.compile(rt.stateFrame("ch"), cfg, seqCol = Some(ChannelRuntime.SeqCol))
          .schema.fieldNames.toSeq, s"$name schema after $tickLabel")
    }
  }

  test("delta snapshot == full recompute across 3 ticks, all view shapes") {
    withRuntime { rt =>
      val vs = new ViewServer(rt, defaultLimit = 4)
      val views = Map(
      // plain view over keyed state (upsert-by-state-key + ring cap 4)
      "plain" -> ViewConfig(),
      // expressions + filter + sort + explicit limit
      "rich" -> ViewConfig(
        expressions = Seq("x2" -> "x * 2"),
        filter = Seq(("x", ">", 1L)),
        sort = Seq(("x", false)),
        limit = Some(3)),
      // index-collapse on a DIFFERENT key than the state key — the
      // two-level upsert (state key first, then index key) matters:
      // a category whose only row was superseded must disappear
      "by_cat" -> ViewConfig(
        index = Some((Seq("cat"), ChannelRuntime.SeqCol)),
        sort = Seq(("cat", true))),
      // filter-staleness trap: a key whose LATEST row fails the
      // filter must drop out even though an older row passed
      "gate" -> ViewConfig(filter = Seq(("x", "<=", 10L)), sort = Seq(("k", true))))

      views.foreach { case (n, c) => vs.define(n, "ch", c) }
      views.keys.foreach(n => assert(vs.deltaActive(n), s"$n should be delta-maintained"))

      // tick 1: initial load
      rt.send("ch", Seq(
        Map("k" -> "a", "cat" -> "u", "x" -> 1L),
        Map("k" -> "b", "cat" -> "v", "x" -> 5L),
        Map("k" -> "c", "cat" -> "u", "x" -> 3L)))
      rt.processAllAvailable()
      assertParity(rt, vs, views, 4, "tick1")

      // tick 2: key updates (a moves category, c goes over the gate)
      rt.send("ch", Seq(
        Map("k" -> "a", "cat" -> "w", "x" -> 7L),
        Map("k" -> "c", "cat" -> "u", "x" -> 99L)))
      rt.processAllAvailable()
      assertParity(rt, vs, views, 4, "tick2")

      // tick 3: new keys push the ring cap; b retakes category v
      rt.send("ch", Seq(
        Map("k" -> "d", "cat" -> "v", "x" -> 2L),
        Map("k" -> "e", "cat" -> "w", "x" -> 8L),
        Map("k" -> "b", "cat" -> "v", "x" -> 4L)))
      rt.processAllAvailable()
      assertParity(rt, vs, views, 4, "tick3")

      // after the initial build, no further full recomputes happened
      assert(vs.fullRefreshCount === 0L)
    }
  }

  test("aggregate views recompute only when the channel ticked") {
    withRuntime { rt =>
      val vs = new ViewServer(rt)
      vs.define("agg", "ch", ViewConfig(
        groupBy = Seq("cat"), aggregates = Seq("mx" -> ("x", "max")),
        sort = Seq(("cat", true))))
      assert(!vs.deltaActive("agg"))

      rt.send("ch", Seq(Map("k" -> "a", "cat" -> "u", "x" -> 1L)))
      rt.processAllAvailable()
      vs.refresh()
      assert(vs.fullRefreshCount === 1L)
      assert(vs.snapshot("agg").map(_.toSeq) === Seq(Seq("u", 1L)))

      // idle refreshes: snapshot stays, no recompute
      vs.refresh(); vs.refresh()
      assert(vs.fullRefreshCount === 1L)

      // a new tick re-enables exactly one recompute
      rt.send("ch", Seq(Map("k" -> "b", "cat" -> "u", "x" -> 9L)))
      rt.processAllAvailable()
      vs.refresh()
      assert(vs.fullRefreshCount === 2L)
      assert(vs.snapshot("agg").map(_.toSeq) === Seq(Seq("u", 9L)))
    }
  }

  test("window-function expressions are not delta-eligible") {
    withRuntime { rt =>
      val vs = new ViewServer(rt)
      vs.define("win", "ch", ViewConfig(
        expressions = Seq("rk" -> "row_number() over (order by x)")))
      assert(!vs.deltaActive("win"))

      // space-free OVER parses fine in Spark SQL — the old " over"
      // substring guard missed it and let the window slip onto the
      // delta path (ADVICE r8); the parsed-tree check must not
      val cfg = ViewConfig(
        expressions = Seq("rk" -> "rank()over(order by x)"),
        sort = Seq(("k", true)))
      vs.define("win2", "ch", cfg)
      assert(!vs.deltaActive("win2"))

      // and since it full-recomputes, the snapshot equals the oracle
      rt.send("ch", Seq(
        Map("k" -> "a", "cat" -> "u", "x" -> 3L),
        Map("k" -> "b", "cat" -> "v", "x" -> 1L)))
      rt.processAllAvailable()
      vs.refresh()
      assert(vs.snapshot("win2").map(_.toSeq) ===
        fullSnapshot(rt, cfg, 1000).map(_.toSeq))

      // conversely an expression merely MENTIONING " over" (here a
      // backquoted identifier) must stay eligible — the substring
      // guard needlessly disabled the optimization for it
      vs.define("named", "ch", ViewConfig(
        expressions = Seq("y" -> "x + `game over`")))
      assert(vs.deltaActive("named"))
    }
  }

  test("delta failure demotes the view to full recompute, snapshot still lands") {
    withRuntime { rt =>
      val vs = new ViewServer(rt)
      // filter on a column that exists only at compile time via
      // expression REPLACEMENT is fine; use an unknown filter column
      // to force the driver evaluator to throw — full path then also
      // fails, but the view must demote (deltaActive false) rather
      // than serve a stale incremental state silently
      vs.define("bad", "ch", ViewConfig(filter = Seq(("ghost", ">", 1L))))
      rt.send("ch", Seq(Map("k" -> "a", "cat" -> "u", "x" -> 1L)))
      rt.processAllAvailable()
      vs.refresh()
      assert(vs.snapshot("bad").isEmpty) // read triggers eval → demotion
      assert(!vs.deltaActive("bad"))
    }
  }
}
