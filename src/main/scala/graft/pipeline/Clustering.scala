package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Embedding-space clustering for corpus curation: distributed
  * k-means (Lloyd) over an embedding column, and SemDeDup-style
  * semantic deduplication (Abbas et al. 2023: cluster the corpus,
  * then drop documents whose embedding is too close to a
  * lower-ranked document in the same cluster).
  *
  * Scale shapes:
  *  - the quantizer (k centroids) is tiny metadata, exactly like
  *    [[Similarity.ivfTopK]]'s coarse quantizer: every assignment is
  *    a NARROW per-row argmax over a centroid array literal embedded
  *    in the plan — zero Exchange, the corpus never shuffles to get
  *    its cell;
  *  - one Lloyd iteration is one partial-aggregated shuffle of
  *    (cell, dim, sum) triples — k×dims rows out of each executor,
  *    nothing proportional to the corpus;
  *  - semantic dedup joins the corpus with itself ON THE CELL KEY
  *    ONLY — the candidate set is Σ|cell|², the SemDeDup contract
  *    (choose k so cells stay bounded; k grows with the corpus).
  *
  * Engine portability (the correctness gate hashes every row, so the
  * arithmetic must be bit-identical in DuckDB):
  *  - seeds are the k vectors with the smallest portable polynomial
  *    hash of their id — deterministic, reproducible in SQL;
  *  - refined centroids are ELEMENTWISE INTEGER SUMS of quantized
  *    coordinates `floor(1e6·x + 0.5)` (floor, not round: engines
  *    disagree on half-rounding of doubles, floor they agree on).
  *    Cosine is scale-invariant, so the un-divided sum represents
  *    the mean direction exactly — no float division, no
  *    accumulation-order sensitivity (integer sums commute), no
  *    DECIMAL cross-engine rules;
  *  - assignment folds left-to-right over ascending cell ids with a
  *    strict `>`, so ties keep the lowest cell — the same total
  *    order as SQL's `row_number() ORDER BY cosine DESC, cell ASC`.
  *
  * A centroid sum stays exact in double as long as each cell's
  * Σ|floor(1e6·x+0.5)| < 2^53 — i.e. ~9e9 unit-scale vectors per
  * cell; the driver-side conversion below would lose low bits beyond
  * that (raise k long before then).
  */
object Clustering {

  /** The k corpus rows with the smallest portable id hash (ties by
    * id): deterministic, engine-reproducible seed centroids. Returns
    * (cell 0..k-1, centroid as Seq[Double]) collected to the driver —
    * quantizer metadata, the IVF contract.
    */
  def seedCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): Array[(Long, Seq[Double])] =
    corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        TextFunctions.polyHash(col(idCol).cast("string")).as("_h"))
      .orderBy(col("_h"), col("_id"))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        val v = r.getSeq[Any](1)
        require(v != null && !v.contains(null),
          s"kmeans: seed vector for id ${r.get(0)} is null or has null elements")
        (i.toLong, v.map {
          case f: Float => f.toDouble
          case d: Double => d
          case x => x.toString.toDouble
        })
      }

  /** Narrow per-row argmax cell assignment over a collected centroid
    * set — the shared quantizer fold (see [[Similarity.ivfTopK]]).
    * Rows whose cosine is NaN against every centroid (zero-norm
    * vectors) keep the sentinel cell -1.
    */
  def assignCell(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    require(cents.nonEmpty,
      "kmeans: no usable centroids — every corpus row is zero-norm, or " +
        "k rounds down to 0 (an empty array() literal would fail later " +
        "with an opaque analysis error)")
    val centArr = array(cents.map { case (cid, v) =>
      struct(lit(cid).as("c"), typedLit(v).as("ce"))
    }: _*)
    Similarity.argmaxCell(vec, centArr)
  }

  /** Centroid-distance outlier report: each vector's cosine to its OWN
    * assigned centroid, flagging rows under `threshold` — the standard
    * "likely mislabeled / noise" probe over an embedding column (far
    * from every cluster center ⇒ nothing represents it). Zero-norm
    * vectors (sentinel cell -1) are always outliers. Narrow end to
    * end: the quantizer rides the expression tree as literals, so the
    * report attaches to any scan already reading vectors — no join, no
    * shuffle.
    */
  def centroidOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Seq[Double])],
      threshold: Double): DataFrame = {
    require(cents.nonEmpty, "centroidOutliers: empty quantizer")
    val centArr = array(cents.map { case (cid, v) =>
      struct(lit(cid).as("c"), typedLit(v).as("ce"))
    }: _*)
    df.withColumn("cell", Similarity.argmaxCell(col(vecCol), centArr))
      .withColumn("cos_to_centroid",
        when(col("cell") === -1L, lit(null).cast("double"))
          .otherwise(Similarity.cosine(col(vecCol),
            // look the assigned centroid up BY ID (ids need not be
            // positional for a Lloyd-refined quantizer with dropout)
            element_at(
              filter(centArr, x => x.getField("c") === col("cell")), 1)
              .getField("ce"))))
      .filter(col("cell") === -1L || col("cos_to_centroid") < threshold)
      .select(col(idCol), col("cell"), col("cos_to_centroid"))
  }

  /** Integer-exact assignment-margin audit (the silhouette-style
    * "is k right" report): per vector, the best and second-best
    * scores against a fixed set of pre-NORMALIZED, pre-QUANTIZED
    * integer centroids, and the relative margin
    * `(best − second)·1000 div best` — scale-invariant in the vector
    * norm (it cancels), so margins compare across vectors. A cell
    * whose margins crowd zero is indistinguishable from its
    * neighbor — the measured signal that k is too high or two
    * clusters overlap, read per cell as (n, min, mean) milli-margins.
    *
    * Every value in the pipeline is a long: vectors quantize on the
    * trunc(x·2^10) grid, centroid literals are already integer, the
    * scores are exact integer dot products, and the tie-break
    * (score desc, cell asc) and keep rule (best > 0 — a vector
    * anti-aligned with every centroid has no meaningful margin) are
    * integer comparisons. No float ever divides or truncs at query
    * time, so the DuckDB oracle reproduces the report bit-for-bit —
    * the same discipline as the s16 Gram gate.
    *
    * Shape: one narrow projection computes all scores per row
    * (array arithmetic over the centroid literal — no explode, no
    * N×C shuffle), then ONE exchange of metadata-sized (cell,
    * partial) rows.
    */
  def assignmentMargin(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      qcents: Seq[(Long, Seq[Long])],
      scaleBits: Int = 10): DataFrame = {
    require(qcents.size >= 2, "assignmentMargin needs at least 2 centroids")
    val scale = (1L << scaleBits).toDouble
    val centArr = array(qcents.map { case (cid, v) =>
      struct(lit(cid).as("c"), typedLit(v).as("qce"))
    }: _*)
    df.filter(col(vecCol).isNotNull)
      .withColumn("_qv", transform(col(vecCol),
        x => (x.cast("double") * scale).cast("long")))
      .withColumn("_scored", transform(centArr, s => struct(
        aggregate(zip_with(col("_qv"), s.getField("qce"), (a, b) => a * b),
          lit(0L), (acc, y) => acc + y).as("s"),
        (lit(0L) - s.getField("c")).as("nc"))))
      // struct max = (score asc, −cell asc): highest score, ties to
      // the SMALLEST cell id — mirrors the oracle's rank-window order
      .withColumn("_best", array_max(col("_scored")))
      .withColumn("cell", -col("_best.nc"))
      .withColumn("_own", col("_best.s"))
      .withColumn("_sec",
        array_max(expr("transform(filter(_scored, x -> x.nc != _best.nc), x -> x.s)")))
      .filter(col("_own") > 0)
      .withColumn("_rel", expr("(_own - _sec) * 1000 div _own"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("_rel")).as("min_margin_milli"),
        sum(col("_rel")).as("_s"))
      .withColumn("mean_margin_milli", expr("_s div n"))
      .drop("_s")
  }

  /** `iters` Lloyd iterations from the hash-seeded centroids; returns
    * the final centroid set. Each iteration: narrow assignment, then
    * ONE shuffle of (cell, dim, partial-sum) — the refined centroid is
    * the elementwise integer sum of `floor(1e6·x + 0.5)` (see the
    * class doc for why sums, not means). Cells that capture no rows
    * disappear (their id is simply absent from the next round's
    * quantizer), mirroring standard Lloyd empty-cell dropout.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 1): Array[(Long, Seq[Double])] = {
    var cents = seedCentroids(corpus, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      val sums = lloydSums(corpus, vecCol, cents.toIndexedSeq).collect()
      cents = sums
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1)).map(_.getLong(2).toDouble).toSeq)
        }
        .toArray
        .sortBy(_._1)
    }
    cents
  }

  /** One Lloyd round's (cell, dim, quantized-sum) frame — the ONLY
    * shuffle in an iteration (plan-audited: partial agg below one
    * keyed exchange). Assignment happens in a projection BELOW the
    * Generate: inlined next to posexplode, the argmax fold would be
    * re-evaluated per exploded element (dims× the work) and
    * interpreted, not codegen'd.
    */
  private[graft] def lloydSums(
      corpus: DataFrame,
      vecCol: String,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    corpus
      .select(col(vecCol).as("_v"),
        assignCell(col(vecCol), cents).as("_cell"))
      .filter(col("_cell") >= 0)
      .select(col("_cell"), posexplode(col("_v")).as(Seq("_d", "_x")))
      .groupBy("_cell", "_d")
      .agg(sum(floor(lit(1000000.0) * col("_x").cast("double") + lit(0.5))
        .cast("long")).as("_s"))

  /** (id, cell) assignment of every corpus row after `iters` Lloyd
    * iterations — the catalog-facing k-means entry point.
    */
  def kmeansAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 1): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, k, iters)
    corpus.select(col(idCol),
      assignCell(col(vecCol), cents.toIndexedSeq).as("cell"))
  }

  /** Cluster label purity — the companion eval to
    * [[Similarity.knnLabelProbe]]: per cell, the share of member rows
    * carrying the cell's majority label (ties → smaller label, the
    * shared determinism discipline). Null labels are excluded — they
    * can neither vote nor count. `assigned` is a [[kmeansAssign]]-style
    * (id, cell) frame; `labels` carries (id, label).
    *
    * Scale shape: one partial-aggregated (cell, label) count shuffle;
    * the majority window and the per-cell totals run over ≤ k·|labels|
    * metadata rows, never corpus rows. Output (cell, n, top_label,
    * top_n, purity).
    */
  def clusterLabelPurity(
      assigned: DataFrame,
      labels: DataFrame,
      idCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lab = assigned.join(
      labels.filter(col(labelCol).isNotNull)
        .select(col(idCol), col(labelCol).cast("long").as("_lbl")), Seq(idCol))
    val counts = lab.groupBy("cell", "_lbl").agg(count(lit(1)).as("_c"))
    val tot = counts.groupBy("cell").agg(sum(col("_c")).as("n"))
    val w = Window.partitionBy("cell").orderBy(col("_c").desc, col("_lbl").asc)
    counts.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .join(tot, Seq("cell"))
      .select(col("cell"), col("n"), col("_lbl").as("top_label"),
        col("_c").as("top_n"), (col("_c") / col("n")).as("purity"))
  }

  /** SemDeDup candidate pairs: same-cell document pairs (id1 < id2)
    * with cosine >= `threshold`. The join key is the cell — never
    * all-pairs across the corpus.
    */
  def semanticDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      iters: Int = 1): DataFrame =
    semanticDupPairsWith(corpus, idCol, vecCol,
      kmeansCentroids(corpus, idCol, vecCol, k, iters), threshold)

  /** SemDeDup: keep a document iff no LOWER-id document in its cell
    * is within `threshold` cosine — one distinct-projection of the
    * pair frame and one anti-join. Returns surviving (id, cell).
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      iters: Int = 1): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, k, iters)
    val assigned = corpus.select(col(idCol),
      assignCell(col(vecCol), cents.toIndexedSeq).as("cell"))
    val dropped = semanticDupPairsWith(corpus, idCol, vecCol, cents, threshold)
      .select(col("id2").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
  }

  /** Cross-corpus SEMANTIC decontamination: drop every training
    * document whose embedding sits within `threshold` cosine of any
    * eval-set vector — the embedding-space complement to the n-gram
    * benchmark decontamination (`Curation.contaminationOverlap`),
    * catching paraphrased/reworded benchmark leakage that shares no
    * 5-gram with the eval text. The coarse quantizer is fitted on
    * corpus ∪ eval so both sides land in consistent cells; candidates
    * are same-cell pairs ONLY (the SemDeDup pruning contract — a
    * paraphrase far enough to quantize into a different cell is by
    * construction below any threshold this op is used with), and the
    * eval side rides BROADCAST (eval suites are thousands of rows
    * against a corpus of billions — the d8 asymmetry). Returns
    * surviving corpus (id, cell); zero-norm corpus vectors (cell −1)
    * cannot pair and always survive.
    *
    * Scale shape: centroid fit is the k-means machinery (integer
    * centroid sums, metadata-sized driver state); the probe is one
    * narrow corpus projection + broadcast hash join on the cell +
    * exact cosine verify; the only corpus exchange is the final
    * anti-join's, on fixed-width (id) rows.
    */
  def semanticDecontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      iters: Int = 1): DataFrame = {
    // the seed sort is (hash(id), id): an id appearing on BOTH sides
    // (eval drawn from the corpus — the common overlap) would tie and
    // seed in engine order; dropDuplicates on (id, vector) makes that
    // case deterministic. An id naming DIFFERENT vectors on the two
    // sides is a caller data error — ids must identify vectors
    // uniquely across corpus ∪ eval.
    val cents = kmeansCentroids(
      corpus.select(col(idCol), col(vecCol))
        .unionByName(evalSet.select(col(idCol), col(vecCol)))
        .dropDuplicates(idCol, vecCol),
      idCol, vecCol, k, iters)
    val assigned = corpus.select(col(idCol),
      assignCell(col(vecCol), cents.toIndexedSeq).as("cell"))
    val probe = corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        assignCell(col(vecCol), cents.toIndexedSeq).as("_cell"))
      .filter(col("_cell") >= 0)
    val ev = evalSet
      .select(col(vecCol).as("_ev"),
        assignCell(col(vecCol), cents.toIndexedSeq).as("_cell"))
      .filter(col("_cell") >= 0)
    val contaminated = probe.join(broadcast(ev), Seq("_cell"))
      .filter(Similarity.cosine(col("_v"), col("_ev")) >= lit(threshold))
      .select(col("_id").as(idCol)).distinct()
    assigned.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[semanticDupPairs]] against an already-fitted quantizer — lets
    * [[semanticDedup]] fit once instead of twice.
    */
  def semanticDupPairsWith(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Long, Seq[Double])],
      threshold: Double): DataFrame = {
    val assigned = corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        assignCell(col(vecCol), cents.toIndexedSeq).as("_cell"))
      .filter(col("_cell") >= 0)
    assigned.as("a")
      .join(assigned.as("b"),
        col("a._cell") === col("b._cell") && col("a._id") < col("b._id"))
      .select(col("a._cell").as("cell"),
        col("a._id").as("id1"), col("b._id").as("id2"),
        Similarity.cosine(col("a._v"), col("b._v")).as("cosine"))
      .filter(col("cosine") >= lit(threshold))
  }
}
