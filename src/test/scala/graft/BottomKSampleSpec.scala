package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BKSample, BottomKSample, PolyHash}

class BottomKSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ph(id: Long): Long = PolyHash.hash(UTF8String.fromString(id.toString))

  test("sample is the k smallest (hash, id) pairs, in rank order") {
    val ids = (1L to 100L).toSeq
    val expected = ids.sortBy(id => (ph(id), id)).take(10)
    val got = Seq(ids).toDF("ids")
      .select(explode($"ids").as("id"))
      .agg(BottomKSample.bottomKSample($"id", 10).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got === expected)
  }

  test("sample is independent of partition layout") {
    val ids = (1L to 500L).toSeq
    def sampleWith(parts: Int) =
      spark.sparkContext.parallelize(ids, parts).toDF("id")
        .agg(BottomKSample.bottomKSample($"id", 25).as("s"))
        .collect().head.getSeq[Long](0)
    assert(sampleWith(1) === sampleWith(13))
  }

  test("appending rows only displaces worst members (stability)") {
    val s1 = new BKSample(5)
    (1L to 50L).foreach(id => s1.add(ph(id), id))
    val before = s1.members
    (51L to 60L).foreach(id => s1.add(ph(id), id))
    val after = s1.members
    // every survivor from the smaller corpus keeps its relative order
    val surviving = before.filter(after.contains)
    assert(after.filter(surviving.contains).toSeq === surviving.toSeq)
  }

  test("merge equals single-pass build") {
    val a = new BKSample(8); val b = new BKSample(8); val whole = new BKSample(8)
    (1L to 30L).foreach { id => a.add(ph(id), id); whole.add(ph(id), id) }
    (31L to 70L).foreach { id => b.add(ph(id), id); whole.add(ph(id), id) }
    a.mergeWith(b)
    assert(a.members.toSeq === whole.members.toSeq)
  }

  test("serialization round-trips") {
    val s = new BKSample(4)
    (1L to 20L).foreach(id => s.add(ph(id), id))
    assert(BKSample.deserialize(s.serialize).members.toSeq === s.members.toSeq)
  }

  test("groups smaller than k return the whole group") {
    val got = Seq(1L, 2L, 3L).toDF("id")
      .agg(BottomKSample.bottomKSample($"id", 10).as("s"))
      .collect().head.getSeq[Long](0)
    assert(got.toSet === Set(1L, 2L, 3L))
  }

  test("SQL registration: graft_bottomk_sample works from spark.sql") {
    Seq(5L, 6L, 7L).toDF("id").createOrReplaceTempView("bk_ids")
    val got = spark.sql("SELECT graft_bottomk_sample(id, 2) AS s FROM bk_ids")
      .collect().head.getSeq[Long](0)
    assert(got.length === 2)
  }
}
