package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TKState, TopKBy}

class TopKBySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keeps the k largest scores, id ascending breaks ties") {
    val s = new TKState(3)
    s.add(5, 10); s.add(7, 20); s.add(5, 2); s.add(1, 30); s.add(7, 25)
    // best first: (7,20) beats (7,25) on id; (5,2) beats (5,10)
    assert(s.members.toSeq === Seq((7L, 20L), (7L, 25L), (5L, 2L)))
  }

  test("merge equals single-pass build") {
    val a = new TKState(4); val b = new TKState(4); val whole = new TKState(4)
    val xs = Seq((3L, 1L), (9L, 2L), (9L, 3L), (2L, 4L), (8L, 5L), (10L, 6L), (1L, 7L))
    xs.take(3).foreach { case (s, id) => a.add(s, id); whole.add(s, id) }
    xs.drop(3).foreach { case (s, id) => b.add(s, id); whole.add(s, id) }
    a.mergeWith(b)
    assert(a.members.toSeq === whole.members.toSeq)
  }

  test("result is independent of partition layout") {
    val rows = (1L to 300L).map(i => (i % 7, (i * 37) % 101, i))
    def topWith(parts: Int) =
      spark.sparkContext.parallelize(rows, parts).toDF("g", "score", "id")
        .groupBy($"g")
        .agg(TopKBy.topKBy($"score", $"id", 5).as("top"))
        .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))).toMap
    assert(topWith(1) === topWith(11))
  }

  test("serialization round-trips") {
    val s = new TKState(3)
    Seq((4L, 1L), (6L, 2L), (6L, 9L), (2L, 3L)).foreach { case (sc, id) => s.add(sc, id) }
    assert(TKState.deserialize(s.serialize).members.toSeq === s.members.toSeq)
  }

  test("SQL registration: graft_topk_by works from spark.sql") {
    Seq((1L, 5L), (2L, 9L), (3L, 7L)).toDF("id", "score")
      .createOrReplaceTempView("tk_rows")
    val got = spark.sql("SELECT graft_topk_by(score, id, 2) AS t FROM tk_rows")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got === Seq((9L, 2L), (7L, 3L)))
  }
}
