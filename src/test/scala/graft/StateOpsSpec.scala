package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.state._

class StateOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ticks = Seq(
    // (seq, k, v)
    (1L, "a", 10), (2L, "b", 20), (3L, "a", 30), (4L, null, 5), (5L, "b", 40)
  ).toDF("seq", "k", "v")

  test("lastByKey keeps the latest row per key (arrival order)") {
    val res = StateOps.lastByKey(ticks, Seq("k"), "seq")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Int]("v"))).toMap
    assert(res === Map("a" -> 30, "b" -> 40, (null: String) -> 5))
  }

  test("lastByKeyRanged equals lastByKey (rows) and scan order (r15 optimization)") {
    val a = StateOps.scan(StateOps.lastByKey(ticks, Seq("k"), "seq"), Seq("k"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Int]("v"))).toSeq
    val b = StateOps.scan(StateOps.lastByKeyRanged(ticks, Seq("k"), "seq"), Seq("k"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Int]("v"))).toSeq
    assert(a === b)
    assert(b === Seq((null, 5), ("a", 30), ("b", 40))) // NULLS FIRST kept
    // two-key variant (the t3 shape)
    val t2 = Seq((1L, "a", 1, 10), (2L, "a", 1, 20), (3L, "b", 2, 30))
      .toDF("seq", "k1", "k2", "v")
    val a2 = StateOps.scan(
      StateOps.lastByKey(t2, Seq("k1", "k2"), "seq"), Seq("k1", "k2"))
      .collect().map(_.toSeq).toSeq
    val b2 = StateOps.scan(
      StateOps.lastByKeyRanged(t2, Seq("k1", "k2"), "seq"), Seq("k1", "k2"))
      .collect().map(_.toSeq).toSeq
    assert(a2 === b2)
  }

  test("lastByKeyRanged rejects dotted/missing keys (those take lastByKey)") {
    intercept[IllegalArgumentException] {
      StateOps.lastByKeyRanged(ticks, Seq("nope"), "seq")
    }
  }

  test("scan orders keys ASC NULLS FIRST") {
    val res = StateOps.scan(StateOps.lastByKey(ticks, Seq("k"), "seq"), Seq("k"))
      .collect().map(_.getAs[String]("k")).toSeq
    assert(res === Seq(null, "a", "b"))
  }

  test("missing keyby attribute groups everything under NULL (reference semantics)") {
    val res = StateOps.lastByKey(ticks, Seq("nope"), "seq").collect()
    assert(res.length === 1)
    assert(res.head.getAs[Int]("v") === 40) // last arrival overall
    // and the full query path (which orders by the key alias) must not crash
    assert(StateOps.queryTicks(ticks, Seq("nope"), "seq").collect().length === 1)
  }

  test("dotted keyby path through the full query path") {
    val df = ticks.withColumn("nest", org.apache.spark.sql.functions.struct($"k"))
    val res = StateOps.queryTicks(df, Seq("nest.k"), "seq").collect()
    assert(res.length === 3)
  }

  test("filter query: literal cast to column type, conjunctive") {
    val q = StateQuery(Seq(
      StateFilter("v", FilterBy.Value(10.9), ">"), // cast 10.9 -> int 10
      StateFilter("k", FilterBy.Value("a"), "==")))
    val res = StateOps.queryTicks(ticks, Seq("k"), "seq", q).collect()
    assert(res.map(_.getAs[Int]("v")).toSeq === Seq(30))
  }

  test("unknown filter attribute is ignored, not an error") {
    val q = StateQuery(Seq(StateFilter("ghost", FilterBy.Value(1), "==")))
    val res = StateOps.queryTicks(ticks, Seq("k"), "seq", q).collect()
    assert(res.length === 3)
  }

  test("attr-vs-attr filter") {
    val df = Seq((1L, 1, 2), (2L, 5, 3)).toDF("seq", "x", "y")
    val q = StateQuery(Seq(StateFilter("x", FilterBy.Attr("y"), "<")))
    val res = StateOps.query(df, Seq("seq"), q)
    assert(res.collect().map(_.getAs[Int]("x")).toSeq === Seq(1))
  }

  test("last returns most recent tick; basket variant per key") {
    assert(StateOps.last(ticks, "seq").collect().head.getAs[Int]("v") === 40)
    val basket = StateOps.last(ticks, "seq", basketKey = Some("k"))
    assert(basket.collect().length === 3)
  }

  test("query JSON parser round-trips the reference shapes") {
    val q = QueryTranslator.parseJson(
      """{"filters":[{"attr":"x","by":{"value":5},"where":"<"},
        |{"attr":"t","by":{"when":"2020-01-01T00:00:00Z"},"where":">="},
        |{"attr":"a","by":{"attr":"b"},"where":"!="}]}""".stripMargin)
    assert(q.filters.map(_.where) === Seq("<", ">=", "!="))
    assert(q.filters(0).by === FilterBy.Value(5L))
    assert(q.filters(2).by === FilterBy.Attr("b"))
  }
}
