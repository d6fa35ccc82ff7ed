package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GramMatrix

/** Distributed PCA / whitening over an embedding column.
  *
  * The corpus-scale part is ONE pass: [[graft.functions.GramMatrixAgg]]
  * reduces the table to an exact integer (n, sums, upper-tri products)
  * buffer (~17 KB at dim 64) with map-side partial aggregation. The
  * d×d eigen-decomposition is metadata-sized and runs on the driver
  * (cyclic Jacobi — unconditionally convergent for symmetric
  * matrices); the projection back over the corpus is a narrow
  * codegen'd fold per component, zero shuffle.
  *
  * This is the standard two-step for embedding whitening / dimension
  * reduction in training-data pipelines (dedup preprocessing, index
  * build, drift monitoring): nothing about it needs a second corpus
  * scan or a distributed linear-algebra library.
  */
object Pca {

  /** Exact integer Gram triples `(i, j, v)` — see GramMatrixAgg docs
    * for the row encoding ((0,0)=n, (0,j)=sums, (i,j)=products).
    */
  def gramTriples(df: DataFrame, vecCol: String, dim: Int,
      scaleBits: Int = GramMatrix.DefaultScaleBits): DataFrame =
    df.agg(GramMatrix.gramTriples(col(vecCol), dim, scaleBits).as("g"))
      .select(inline(col("g")))

  /** Per-group Gram triples `(keys…, i, j, v)`: one buffer per key
    * through the same map-side-combined aggregate — per-domain /
    * per-label covariance in one pass (the input to per-group drift
    * comparison or per-group whitening). The shuffle carries one
    * ~17 KB buffer per (partition, key), never vectors.
    */
  def gramTriplesBy(df: DataFrame, keys: Seq[String], vecCol: String,
      dim: Int, scaleBits: Int = GramMatrix.DefaultScaleBits): DataFrame = {
    require(keys.nonEmpty, "gramTriplesBy needs at least one key")
    df.groupBy(keys.map(col): _*)
      .agg(GramMatrix.gramTriples(col(vecCol), dim, scaleBits).as("g"))
      .select(keys.map(col) :+ inline(col("g")): _*)
      // a group whose vectors were ALL null carries no matrix — drop
      // its lone (0,0,0) marker row: the grouped SQL mirror (null
      // vectors filtered before GROUP BY) and the streaming twin
      // (no-arrival keys emit nothing) both omit such groups, and the
      // ungrouped gramTriples keeps the n=0 row (its GROUP-BY-less
      // oracle emits one), so the three surfaces stay aligned
      .filter(!(col("i") === 0 && col("j") === 0 && col("v") === 0L))
  }

  /** Sample mean and covariance recovered from collected gram triples.
    * Unscaling divides by 2^scaleBits (mean) / 2^(2·scaleBits)
    * (second moments); covariance uses the 1/n (population) convention
    * so `cov = E[xxᵀ] - μμᵀ` holds exactly in the quantized domain.
    */
  def covariance(
      triples: Seq[(Int, Int, Long)],
      dim: Int,
      scaleBits: Int = GramMatrix.DefaultScaleBits)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val s = java.lang.Math.scalb(1.0, -scaleBits)
    var n = 0L
    val sums = new Array[Long](dim)
    val prods = Array.ofDim[Long](dim, dim)
    triples.foreach {
      case (0, 0, v) => n = v
      case (0, j, v) => sums(j - 1) = v
      case (i, j, v) => prods(i - 1)(j - 1) = v; prods(j - 1)(i - 1) = v
    }
    require(n > 0, "covariance of an empty table")
    val mean = sums.map(_ * s / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      prods(i)(j) * s * s / n - mean(i) * mean(j)
    }
    (n, mean, cov)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-rows), sorted by descending
    * eigenvalue. Deterministic: fixed sweep order, rotation angle from
    * the closed form, convergence when the off-diagonal Frobenius mass
    * drops below `tol` (or `maxSweeps`, whichever first — Jacobi on a
    * symmetric matrix always converges, the cap is a safety net).
    */
  def jacobiEigSym(
      a0: Array[Array[Double]],
      tol: Double = 1e-12,
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    require(a0.forall(_.length == d), "matrix must be square")
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += 2 * a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0) {
            // closed-form stable rotation (Golub & Van Loan §8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val sg = if (theta >= 0) 1.0 else -1.0
            val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    (values, vectors)
  }

  /** Fitted model: per-dimension mean, top-k components (rows,
    * descending explained variance) and their eigenvalues.
    */
  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Fit the top-`k` principal components in one corpus pass + a
    * driver-side d×d Jacobi decomposition.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int,
      scaleBits: Int = GramMatrix.DefaultScaleBits): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    val triples = gramTriples(df, vecCol, dim, scaleBits)
      .collect() // metadata-sized: dim*(dim+3)/2 + 1 rows, never corpus rows
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .toSeq
    val (n, mean, cov) = covariance(triples, dim, scaleBits)
    val (values, vectors) = jacobiEigSym(cov)
    PcaModel(n, mean, values.take(k), vectors.take(k))
  }

  /** Dot of a vector column with a literal double vector — a narrow
    * codegen'd fold, no shuffle. `dot(x, w)` with x cast elementwise
    * to double (exact for float inputs).
    */
  def litDot(vec: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(vec, array(w.map(lit): _*), (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)

  /** Project onto the fitted components: appends `pc1..pck` columns
    * where `pc_m = (x - μ)·c_m`, computed as `x·c_m - μ·c_m` so the
    * centering is a per-component scalar constant folded into the
    * plan, not a per-row vector subtraction.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel): DataFrame =
    model.components.zipWithIndex.foldLeft(df) { case (d, (comp, m)) =>
      val meanDot = comp.zip(model.mean).map { case (c, mu) => c * mu }.sum
      d.withColumn(s"pc${m + 1}", litDot(col(vecCol), comp) - lit(meanDot))
    }

  /** Whitening: project onto the top-k components and scale each to
    * unit variance (`pc_m / sqrt(λ_m)`), so downstream cosine /
    * Euclidean comparisons weigh every retained direction equally —
    * the standard preprocessing before embedding dedup or index build
    * when raw dimensions have wildly uneven variance. Components with
    * eigenvalue <= `minVariance` are dropped rather than amplified
    * (dividing by a near-zero sqrt would blow up noise directions).
    */
  def whiten(df: DataFrame, vecCol: String, model: PcaModel,
      minVariance: Double = 1e-12): DataFrame = {
    val kept = model.components.zip(model.eigenvalues).zipWithIndex
      .filter { case ((_, ev), _) => ev > minVariance }
    kept.foldLeft(df) { case (d, ((comp, ev), m)) =>
      val meanDot = comp.zip(model.mean).map { case (c, mu) => c * mu }.sum
      d.withColumn(s"wc${m + 1}",
        (litDot(col(vecCol), comp) - lit(meanDot)) / lit(math.sqrt(ev)))
    }
  }

  /** Mahalanobis outlier score in the PCA basis: with whitened
    * coordinates `wc_m = (x-μ)·c_m / sqrt(λ_m)`, the squared
    * Mahalanobis distance is simply `Σ wc_m²` — no explicit Σ⁻¹
    * materialization, numerically stable (near-zero directions are
    * dropped by [[whiten]]'s `minVariance` guard instead of blowing
    * up), and a narrow per-row fold like everything else in this
    * family. For Gaussian-ish data the score is ~χ²(k): mean ≈ k, so
    * `score > k + c·sqrt(2k)` is the usual cut. This is the
    * embedding-corruption filter run before dedup/index build:
    * truncated/garbage vectors land far outside the corpus ellipsoid
    * even when their norm looks ordinary.
    */
  def outlierScores(df: DataFrame, vecCol: String, model: PcaModel,
      minVariance: Double = 1e-12): DataFrame = {
    val kept = model.components.zip(model.eigenvalues)
      .count { case (_, ev) => ev > minVariance }
    require(kept > 0,
      s"outlierScores: every eigenvalue <= $minVariance (constant or " +
        "degenerate corpus) — no direction carries variance to score against")
    val w = whiten(df, vecCol, model, minVariance)
    w.withColumn("maha_sq",
      (1 to kept).map(m => col(s"wc$m") * col(s"wc$m"))
        .reduce(_ + _))
  }

  /** Exact integer projection of the QUANTIZED vector onto a literal
    * integer axis — the oracle-gated kernel beneath [[project]]:
    * `p = Σ trunc(toDouble(x_k)·2^scaleBits) · w_k`, bit-identical in
    * Spark and DuckDB (see GramMatrixAgg's quantization contract).
    *
    * Range contract: the declarative fold uses plain long arithmetic
    * (a codegen'd `zip_with`/`aggregate` cannot carry `addExact`), so
    * the caller owns the bound `dim · max|x|·2^scaleBits · max|w| <
    * 2^63` — trivially satisfied for unit-scale embeddings and
    * small-integer axes (~2^43 at the defaults, 2^20 of headroom);
    * use [[GramMatrixAgg]] (checked) where inputs are not under the
    * caller's control.
    */
  def axisProjectQuantized(vec: Column, w: Array[Long],
      scaleBits: Int = GramMatrix.DefaultScaleBits): Column = {
    val scale = java.lang.Math.scalb(1.0, scaleBits)
    aggregate(
      zip_with(vec, array(w.map(lit): _*),
        (x, wk) => (x.cast("double") * lit(scale)).cast("long") * wk),
      lit(0L), (acc, x) => acc + x)
  }
}
