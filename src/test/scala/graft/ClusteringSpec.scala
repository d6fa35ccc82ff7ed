package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Clustering

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tight clusters on orthogonal axes + one outlier direction
  private def vecs = Seq(
    (1L, Array(1.0f, 0.02f, 0.0f)),
    (2L, Array(0.98f, 0.05f, 0.0f)),
    (3L, Array(0.99f, 0.01f, 0.01f)),
    (10L, Array(0.0f, 1.0f, 0.03f)),
    (11L, Array(0.02f, 0.97f, 0.0f)),
    (20L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("id", "vec")

  test("assignmentMargin: exact integer margins, tie to smaller cell, best<=0 dropped") {
    // axis-aligned integer centroids (already "quantized"): scores
    // are exact integer dot products on the 2^0 grid
    val qc = Seq((0L, Seq(10L, 0L, 0L)), (1L, Seq(0L, 10L, 0L)))
    val rows = Seq(
      (1L, Array(8.0f, 2.0f, 0.0f)),   // cell 0: own 80, sec 20 → rel 750
      (2L, Array(5.0f, 5.0f, 0.0f)),   // tie 50/50 → smaller cell 0, rel 0
      (3L, Array(1.0f, 9.0f, 0.0f)),   // cell 1: own 90, sec 10 → rel 888
      (4L, Array(-1.0f, -1.0f, 0.0f)), // best score < 0 → dropped
      (5L, null.asInstanceOf[Array[Float]])) // null vec skipped
      .toDF("id", "vec")
    val out = Clustering.assignmentMargin(rows, "id", "vec", qc, scaleBits = 0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cell 0: rels {750, 0} → n 2, min 0, mean 375; cell 1: {888}
    assert(out === Map(
      0L -> ((2L, 0L, 375L)),
      1L -> ((1L, 888L, 888L))), out.toString)
    intercept[IllegalArgumentException] {
      Clustering.assignmentMargin(rows, "id", "vec", qc.take(1))
    }
  }

  test("kmeans assigns co-directional vectors to the same cell") {
    val cells = Clustering.kmeansAssign(vecs, "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells.size === 6)
    assert(cells(1L) === cells(2L) && cells(2L) === cells(3L))
    assert(cells(10L) === cells(11L))
    assert(cells(1L) !== cells(10L))
    assert((cells(20L) !== cells(1L)) && (cells(20L) !== cells(10L)))
  }

  test("seed centroids are deterministic and k-bounded") {
    val a = Clustering.seedCentroids(vecs, "id", "vec", 3)
    val b = Clustering.seedCentroids(vecs, "id", "vec", 3)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._1).toSeq === Seq(0L, 1L, 2L))
  }

  test("semantic dedup drops the higher-id member of a same-cell near-dup pair") {
    val surv = Clustering.semanticDedup(vecs, "id", "vec", k = 3,
      threshold = 0.99, iters = 1)
      .collect().map(_.getLong(0)).toSet
    // 1,2,3 are mutually >0.99 cosine → only the min id survives the
    // cluster; 10/11 likewise; the outlier 20 always survives
    assert(surv.contains(1L) && !surv.contains(2L) && !surv.contains(3L))
    assert(surv.contains(20L))
  }

  test("zero-norm vectors keep the sentinel cell -1 and survive dedup") {
    val withZero = vecs.union(Seq((99L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "vec"))
    val cells = Clustering.kmeansAssign(withZero, "id", "vec", k = 3, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(99L) === -1L)
    val surv = Clustering.semanticDedup(withZero, "id", "vec", k = 3,
      threshold = 0.99, iters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(surv.contains(99L))
  }

  test("semanticDecontaminate: near-eval vectors dropped, far and zero-norm survive") {
    // eval set sits on the x-axis: corpus 1,2,3 are near-dups of it,
    // 10/11 and 20 are orthogonal, 99 is zero-norm (cell -1)
    val corpus = vecs.union(Seq((99L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "vec"))
    val evalSet = Seq((1000L, Array(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val surv = Clustering.semanticDecontaminate(
      corpus, evalSet, "id", "vec", k = 3, threshold = 0.95, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!surv.contains(1L) && !surv.contains(2L) && !surv.contains(3L),
      surv.toString) // paraphrase-leaked rows dropped
    assert(surv.contains(10L) && surv.contains(11L) && surv.contains(20L))
    assert(surv(99L) === -1L) // zero-norm cannot pair — survives with sentinel
    // an empty eval set decontaminates nothing
    val none = Clustering.semanticDecontaminate(
      corpus, evalSet.filter(col("id") < 0), "id", "vec",
      k = 3, threshold = 0.95, iters = 1).count()
    assert(none === 7L)
  }

  test("cluster purity: majority share per cell, vote ties to the smaller label") {
    val assigned = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (10L, 1L), (11L, 1L))
      .toDF("id", "cell")
    // cell 0: labels 7,7,5,5 — tie → top_label 5; cell 1: 9 + a null (excluded)
    val labels = Seq((1L, Some(7)), (2L, Some(7)), (3L, Some(5)), (4L, Some(5)),
      (10L, Some(9)), (11L, None)).toDF("id", "label")
    val out = Clustering.clusterLabelPurity(assigned, labels, "id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) === ((4L, 5L, 2L, 0.5)))
    assert(out(1L) === ((1L, 9L, 1L, 1.0)))
  }

  test("kNN label probe: majority vote, tie to the smaller label, self excluded") {
    import graft.pipeline.Similarity
    // query 1 at the x-axis: neighbors 2 (label 8), 3 (label 4), 20 (far) —
    // k=2 gives one vote each → tie → pred 4; correct iff own label is 4
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), Some(4)),
      (2L, Array(0.99f, 0.1f, 0.0f), Some(8)),
      (3L, Array(0.98f, 0.05f, 0.0f), Some(4)),
      (20L, Array(0.0f, 0.0f, 1.0f), Some(8)),
      (21L, Array(0.0f, 0.1f, 1.0f), None) // null label: neither votes nor scored
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelProbe(emb, emb.filter($"vec_id" === 1 || $"vec_id" === 21),
      "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 4L, 4L, 1L, 1L)))
  }
}
