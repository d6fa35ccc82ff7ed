package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge union-by-name fills missing columns with null (X1)") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, true)).toDF("id", "b")
    val m = Transforms.merge(Seq(a, b)).collect()
    assert(m.length === 2)
    assert(m.map(_.schema.fieldNames.toSet).head === Set("id", "a", "b"))
  }

  test("unroll/toList roundtrip (X2/X3)") {
    val df = Seq((1, 10), (2, 20)).toDF("id", "v")
    val wrapped = Transforms.toList(df, Seq("id", "v"))
    val un = Transforms.unrollWithPos(wrapped.select($"items"), "items", "item")
      .select($"item.*")
    assert(un.collect().map(r => (r.getInt(0), r.getInt(1))).toSet === Set((1, 10), (2, 20)))
  }

  test("applyFilter drops null results (X4)") {
    val df = Seq(1, 2, 3, 4).toDF("v")
    val res = Transforms.applyFilter(df, "out", when($"v" % 2 === 0, $"v" * 10))
    assert(res.collect().map(_.getAs[Int]("out")).toSeq === Seq(20, 40))
  }

  test("pspFlatten: nested structs to dotted columns, map stringified (X6)") {
    val df = Seq((1, ("in", 2))).toDF("id", "nest")
      .withColumn("m", map(lit("k"), lit("v")))
    val flat = Transforms.pspFlatten(df)
    assert(flat.schema.fieldNames.toSet === Set("id", "nest._1", "nest._2", "m"))
    assert(flat.collect().head.getAs[String]("m") === """{"k":"v"}""")
  }

  test("computed index joins fields with dash; nulls render as None (X8)") {
    val df = Seq((1, "a"), (2, null)).toDF("x", "y")
    val r = Transforms.computedIndex(df, Seq("x", "y")).collect()
    assert(r.map(_.getAs[String]("index")).toSeq === Seq("1-a", "2-None"))
  }

  test("pspFlatten recurses into arrays nested inside structs") {
    val df = Seq((1, (Seq(10, 20), "z"))).toDF("id", "nest")
    val flat = Transforms.pspFlatten(df)
    assert(flat.schema.fieldNames.toSet === Set("id", "nest._1", "nest._2"))
    assert(flat.count() === 2) // inner list unrolled to rows
  }

  test("asof join ignores null right times; tie-break makes equal-time rights deterministic") {
    val left = Seq((1L, 1L, ts("2020-01-05"))).toDF("eid", "k", "t")
    val right = Seq(
      (1L, Option.empty[java.sql.Timestamp], 666.0, 1L),
      (1L, Some(ts("2020-01-04")), 1.0, 2L),
      (1L, Some(ts("2020-01-04")), 2.0, 3L) // same time, higher seq wins
    ).toDF("rk", "rt", "p", "rseq")
    val j = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt",
      rightTieBreak = Some("rseq")).collect()
    assert(j.head.getAs[Double]("p") === 2.0)
  }

  test("view compiler: filter + expression + group + sort + limit") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0), ("c", 0.5))
      .toDF("g", "v")
    val v = ViewConfig(
      filter = Seq(("v", ">", 0.6)),
      expressions = Seq(("v2", "v * 2")),
      groupBy = Seq("g"),
      aggregates = Seq("s" -> ("v2", "sum")),
      sort = Seq(("s", false)),
      limit = Some(1))
    val res = Views.compile(df, v).collect()
    assert(res.length === 1)
    assert(res.head.getAs[String]("g") === "b")
    assert(res.head.getAs[Double]("s") === 60.0)
  }

  test("view pivot (A2) and index upsert (A7)") {
    val df = Seq((1L, "a", "x", 1.0), (2L, "a", "y", 2.0), (3L, "a", "x", 5.0))
      .toDF("seq", "g", "p", "v")
    val piv = Views.compile(df, ViewConfig(
      groupBy = Seq("g"), splitBy = Some(("p", Seq("x", "y"))),
      aggregates = Seq("s" -> ("v", "sum"), "c" -> ("v", "count"))))
    val r = piv.collect().head
    assert(r.getAs[Double]("x_s") === 6.0 && r.getAs[Double]("y_s") === 2.0)
    val up = Views.compile(df, ViewConfig(index = Some((Seq("p"), "seq"))))
    assert(up.collect().map(_.getAs[Double]("v")).toSet === Set(5.0, 2.0))
  }

  test("asof backward join picks latest right at-or-before left time") {
    val left = Seq(
      (1L, 1L, ts("2020-01-05")), (2L, 1L, ts("2020-01-10")), (3L, 2L, ts("2020-01-01"))
    ).toDF("eid", "k", "t")
    val right = Seq(
      (1L, ts("2020-01-05"), 100.0), (1L, ts("2020-01-07"), 200.0), (9L, ts("2020-01-01"), 0.0)
    ).toDF("rk", "rt", "price")
    val j = AsofJoin.asofBackward(left, right, "k", "rk", "t", "rt")
      .collect().map(r => r.getAs[Long]("eid") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)).toMap
    assert(j(1L) === Some(100.0)) // exact-time match included (<=)
    assert(j(2L) === Some(200.0)) // latest before
    assert(j(3L) === None)        // no right row for key 2
  }

  test("asof forward join picks earliest right at-or-after left time") {
    val left = Seq((1L, 1L, ts("2020-01-06"))).toDF("eid", "k", "t")
    val right = Seq(
      (1L, ts("2020-01-05"), 1.0), (1L, ts("2020-01-07"), 2.0)).toDF("rk", "rt", "p")
    val j = AsofJoin.asofForward(left, right, "k", "rk", "t", "rt").collect()
    assert(j.head.getAs[Double]("p") === 2.0)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
}
