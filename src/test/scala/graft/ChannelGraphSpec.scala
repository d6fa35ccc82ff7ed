package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class ChannelGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("v", IntegerType)))
  private def specs(names: String*) =
    names.map(n => n -> ChannelSpec(n, schema)).toMap

  test("multiple setters merge via unionByName (X1 / csp.flatten)") {
    val g = new ChannelGraph(specs("a"))
    g.set("a")(Seq(1).toDF("v"))
    g.set("a")(Seq(2).toDF("v"))
    val out = g.finalizeGraph()("a")
    assert(out.collect().map(_.getInt(0)).toSet === Set(1, 2))
  }

  test("required channel without provider raises NoProviderException") {
    val g = new ChannelGraph(specs("a"))
    intercept[NoProviderException] { g.finalizeGraph() }
  }

  test("optional channel without provider resolves to empty frame (null_ts)") {
    val g = new ChannelGraph(Map("a" -> ChannelSpec("a", schema, required = false)))
    assert(g.finalizeGraph().isEmpty) // not materialized when unused
  }

  test("transforms topo-evaluate; cycles detected unless feedback declared") {
    val g = new ChannelGraph(specs("a", "b"))
    g.set("a")(Seq(1, 2).toDF("v"))
    g.transform(Seq("a"), "b")(ins => ins.head.select(($"v" * 10).as("v")))
    assert(g.finalizeGraph()("b").collect().map(_.getInt(0)).toSet === Set(10, 20))

    val cyc = new ChannelGraph(specs("a", "b"))
    cyc.set("a")(Seq(1).toDF("v"))
    cyc.transform(Seq("a", "b"), "b")(ins => ins.head)
    intercept[CycleException] { cyc.finalizeGraph() }

    val fb = new ChannelGraph(specs("a", "b"))
    fb.set("a")(Seq(1).toDF("v"))
    fb.transform(Seq("a", "b"), "b")(ins => ins.head)
    fb.feedback("b")
    assert(fb.finalizeGraph()("b").collect().length === 1)
  }

  test("attach records per-module getters/setters; graph serves post-finalize") {
    // two modules: a source setting `a`, a deriver reading `a` → `b`
    // (reference channels.py:288-309 _add_field_to_graph + 976 graph())
    object SourceModule extends Module {
      def connect(g: ChannelGraph): Unit = g.set("a")(Seq(1, 2).toDF("v"))
    }
    object DeriveModule extends Module {
      def connect(g: ChannelGraph): Unit =
        g.transform(Seq("a"), "b")(ins => ins.head.select(($"v" * 10).as("v")))
    }
    val g = new ChannelGraph(specs("a", "b"))
    g.attach(SourceModule)
    g.attach(DeriveModule)
    intercept[IllegalArgumentException] { g.connectionsGraph } // pre-finalize
    g.finalizeGraph()
    val cg = g.connectionsGraph
    assert(cg("a") === ChannelConnections(Seq("DeriveModule"), Seq("SourceModule")))
    assert(cg("b") === ChannelConnections(Nil, Seq("DeriveModule")))
  }

  test("channel selection include/exclude ordering (X12)") {
    val sel = ChannelSelection(include = Some(Seq("c", "a")), exclude = Seq("b"))
    assert(sel.select(Seq("a", "b", "c")) === Seq("c", "a"))
    assert(ChannelSelection(exclude = Seq("b")).select(Seq("a", "b", "c")) === Seq("a", "c"))
  }
}
