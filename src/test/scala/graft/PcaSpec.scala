package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pca

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("jacobiEigSym matches the 2x2 closed form") {
    val (values, vectors) = Pca.jacobiEigSym(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(approx(values(0), 3.0) && approx(values(1), 1.0))
    // top eigenvector is ±[1,1]/sqrt2
    val v0 = vectors(0)
    assert(approx(math.abs(v0(0)), 1.0 / math.sqrt(2), 1e-9))
    assert(approx(v0(0), v0(1), 1e-9))
  }

  test("jacobiEigSym properties on a seeded symmetric 8x8") {
    val rnd = new scala.util.Random(42)
    val d = 8
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() * 2 - 1
      m(i)(j) = x; m(j)(i) = x
    }
    val (values, vectors) = Pca.jacobiEigSym(m)
    // descending order
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // A·v = λ·v and orthonormality
    for (k <- 0 until d) {
      val v = vectors(k)
      val av = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
      for (i <- 0 until d) assert(approx(av(i), values(k) * v(i), 1e-8))
      for (l <- 0 until d) {
        val dot = (0 until d).map(i => v(i) * vectors(l)(i)).sum
        assert(approx(dot, if (l == k) 1.0 else 0.0, 1e-8))
      }
    }
    // trace preserved
    assert(approx(values.sum, (0 until d).map(i => m(i)(i)).sum, 1e-9))
  }

  test("gram triples are partition-count independent (merge correctness)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(6)(rnd.nextFloat() * 2 - 1)))
    def triples(parts: Int) =
      Pca.gramTriples(
        rows.toDF("vec_id", "embedding").repartition(parts), "embedding", 6)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val one = triples(1)
    assert(one === triples(7))
    assert(one === triples(32))
    assert(one.size === 1 + 6 + 21)
    assert(one.contains((0, 0, 200L)))
  }

  test("fit recovers the dominant axis of correlated data; projection variance matches eigenvalue") {
    // points along direction (3,4)/5 with small isotropic noise
    val rnd = new scala.util.Random(1)
    val rows = Seq.tabulate(2000) { i =>
      val s = rnd.nextGaussian()
      val nx = rnd.nextGaussian() * 0.01
      val ny = rnd.nextGaussian() * 0.01
      (i.toLong, Array((0.6 * s + nx).toFloat, (0.8 * s + ny).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 2, k = 2)
    val c0 = model.components(0)
    // dominant component aligns with (0.6, 0.8) up to sign
    val align = math.abs(c0(0) * 0.6 + c0(1) * 0.8)
    assert(align > 0.99, s"alignment $align")
    assert(model.eigenvalues(0) > 50 * model.eigenvalues(1))
    // projected variance per component ≈ eigenvalue (quantization-tolerant)
    val proj = Pca.project(df, "embedding", model)
    val stats = proj.agg(
      variance(col("pc1")).as("v1"), variance(col("pc2")).as("v2"),
      avg(col("pc1")).as("m1")).head()
    // population-vs-sample correction is ~1/n — inside the 1% tolerance
    assert(math.abs(stats.getDouble(0) - model.eigenvalues(0))
      <= 0.01 * model.eigenvalues(0))
    assert(math.abs(stats.getDouble(2)) < 1e-6) // centered
  }

  test("axisProjectQuantized equals a driver-side recompute") {
    val rnd = new scala.util.Random(3)
    val w = Array.tabulate(5)(k => (k * 3 - 6).toLong)
    val rows = Seq.tabulate(50)(i => (i.toLong, Array.fill(5)(rnd.nextFloat() - 0.5f)))
    val got = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), Pca.axisProjectQuantized(col("embedding"), w).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, vec) =>
      val want = vec.zip(w).map { case (x, wk) =>
        (x.toDouble * 1048576.0).toLong * wk
      }.sum
      assert(got(id) === want)
    }
  }

  test("whiten: covariance of whitened coordinates is the identity") {
    val rnd = new scala.util.Random(5)
    // anisotropic 3-d cloud: stddevs 4 / 1 / 0.25 along rotated axes
    val rows = Seq.tabulate(3000) { i =>
      val a = rnd.nextGaussian() * 4; val b = rnd.nextGaussian()
      val c = rnd.nextGaussian() * 0.25
      (i.toLong, Array(
        (0.5 * a + 0.6 * b + 0.1 * c).toFloat,
        (0.4 * a - 0.5 * b + 0.3 * c).toFloat,
        (0.2 * a + 0.2 * b - 0.9 * c).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 3, k = 3)
    val w = Pca.whiten(df, "embedding", model)
      .select("wc1", "wc2", "wc3").collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = w.length
    for (i <- 0 until 3; j <- i until 3) {
      val mi = w.map(_(i)).sum / n
      val mj = w.map(_(j)).sum / n
      val cov = w.map(v => (v(i) - mi) * (v(j) - mj)).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 0.05, s"cov($i,$j)=$cov")
    }
  }

  test("gramTriplesBy partitions the accumulation per key") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.tabulate(120)(i =>
      (i.toLong, i % 3, Array.fill(4)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val byKey = Pca.gramTriplesBy(df, Seq("label"), "embedding", 4)
      .collect().map(r => (r.getInt(0), (r.getInt(1), r.getInt(2))) -> r.getLong(3)).toMap
    (0 until 3).foreach { lab =>
      val only = Pca.gramTriples(
        df.filter(col("label") === lab), "embedding", 4)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      only.foreach { case (ij, v) => assert(byKey((lab, ij)) === v, s"label $lab $ij") }
      assert(byKey((lab, (0, 0))) === 40L)
    }
  }

  test("gramTriplesBy: a group whose vectors are all null emits no rows") {
    // grouped surfaces (SQL mirror filters nulls before GROUP BY;
    // streaming twin never hears from the key) omit the group — the
    // (0,0,0) marker row must not leak out as a fake zero matrix
    val rows = Seq(
      (1L, 0, Array(1.0f, 2.0f)), (2L, 0, Array(3.0f, 4.0f)),
      (3L, 1, null.asInstanceOf[Array[Float]]),
      (4L, 1, null.asInstanceOf[Array[Float]]))
    val df = rows.toDF("vec_id", "label", "embedding")
    val byKey = Pca.gramTriplesBy(df, Seq("label"), "embedding", 2).collect()
    assert(byKey.nonEmpty)
    val labels = byKey.map(r => r.get(0)).toSet
    assert(labels === Set(0), byKey.mkString(", "))
    // the ungrouped aggregate on an all-null frame keeps its n=0 row
    // (its GROUP-BY-less oracle emits one)
    val empty = Pca.gramTriples(
      df.filter(col("label") === 1), "embedding", 2).collect()
    assert(empty.length === 1
      && empty.head.getInt(0) === 0 && empty.head.getInt(1) === 0
      && empty.head.getLong(2) === 0L)
  }

  test("outlierScores: chi-square mean on clean data; corrupt vector flagged") {
    val rnd = new scala.util.Random(17)
    val clean = Seq.tabulate(2000) { i =>
      val a = rnd.nextGaussian() * 3; val b = rnd.nextGaussian()
      (i.toLong, Array((0.8 * a + 0.1 * b).toFloat, (0.1 * a - 0.9 * b).toFloat))
    }
    val df = clean.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 2, k = 2)
    val scores = Pca.outlierScores(df, "embedding", model)
      .select("maha_sq").collect().map(_.getDouble(0))
    // ~χ²(2): mean ≈ 2
    val mean = scores.sum / scores.length
    assert(math.abs(mean - 2.0) < 0.2, s"mean $mean")
    // a corrupt vector ON the dominant axis but 10× beyond the cloud
    // (unremarkable per-coordinate scale in raw space) scores far out
    val corrupt = Seq((99999L, Array(24f, 3f))).toDF("vec_id", "embedding")
    val s = Pca.outlierScores(corrupt, "embedding", model).head().getAs[Double]("maha_sq")
    assert(s > 20.0, s"corrupt score $s")
  }

  test("gram fails fast on wrong-length vectors") {
    val bad = Seq((1L, Array(0.1f, 0.2f)), (2L, Array(0.3f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.gramTriples(bad, "embedding", 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("gram accumulator overflows loudly, never wraps") {
    // two rows of huge components at the default scale: the product of
    // two quantized ~2^31 values is ~2^62; the second row's add must
    // throw (a silent wrap would corrupt covariance invisibly)
    val buf = new graft.functions.GramBuf(2)
    val q = Array(1L << 31, 1L << 31)
    buf.add(q)
    val e = intercept[ArithmeticException] { buf.add(q) }
    assert(e.getMessage.contains("scaleBits"))
    // merge path is checked too
    val a = new graft.functions.GramBuf(1)
    a.add(Array(1L << 31))
    val b = new graft.functions.GramBuf(1)
    b.add(Array(1L << 31))
    intercept[ArithmeticException] { a.mergeWith(b) }
  }
}
