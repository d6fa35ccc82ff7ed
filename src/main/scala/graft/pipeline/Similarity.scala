package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline,
  * and a sign-LSH (random-hyperplane) bucketed variant as the scale
  * path.
  *
  * Scale design:
  *  - the query set is always the *broadcast* side — brute force is a
  *    broadcast-nested-loop over corpus partitions (linear scan, no
  *    corpus shuffle), and the top-k reduction happens per query key;
  *  - the LSH variant turns the scan into a bucket equi-join: corpus
  *    and queries are hashed to `planes`-bit sign buckets, and only
  *    same-bucket candidates are scored — at 1000 executors this is an
  *    ordinary shuffled join on the bucket key, ~N/2^planes candidates
  *    per query instead of N;
  *  - hyperplanes are generated from a deterministic LCG (seeded by
  *    plane and dimension index), so the bucketing is reproducible in
  *    plain SQL on any engine — no driver-side randomness shipped to
  *    executors, and the DuckDB oracle can mirror it exactly.
  *
  * The dot products run as `zip_with`+`aggregate` Catalyst expressions
  * (codegen'd, no UDF); both engines evaluate the sum left-to-right,
  * which makes cosine values bitwise-identical across Spark and DuckDB
  * — verified, and load-bearing for exact threshold/top-k oracles.
  */
object Similarity {

  /** Cosine similarity of two float vectors, computed in double.
    * Dispatches to the fused codegen'd
    * [[graft.functions.CosineSimExpr]] (one loop, no intermediate
    * arrays); [[cosineDeclarative]] is the SQL-portable specification
    * — bit-identical accumulation order, checked by the oracle gate.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.cosine(a, b)

  /** Declarative (pure built-in) cosine — same values as [[cosine]]. */
  def cosineDeclarative(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (s, v) => s + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** NaN-guarded argmax-cosine fold over a centroid array literal
    * (elements `struct(c: long, ce: array)` in ascending-`c` order):
    * the winning cell id — lowest `c` on cosine ties (strict `>` keeps
    * the first maximum, the same total order as `row_number(cos DESC,
    * c ASC)`), sentinel -1 when every cosine is NaN (zero-norm vector;
    * Spark comparisons are NaN-largest, so the guard is load-bearing).
    * The `cast` names the struct fields — a plain `.as` inside
    * `struct()` is trimmed by the analyzer in some rewrites (generator
    * extraction), breaking the CASE WHEN branch-type match. Shared by
    * [[ivfTopK]] and [[Clustering.assignCell]] so the fold's semantics
    * live in exactly one place.
    */
  def argmaxCell(vec: Column, centArr: Column): Column =
    aggregate(centArr,
      struct(lit(Double.NegativeInfinity).as("cos"), lit(-1L).as("c")),
      (acc, ct) => {
        val cs = cosine(vec, ct.getField("ce"))
        when(!isnan(cs) && cs > acc.getField("cos"),
          struct(cs, ct.getField("c")).cast("struct<cos:double,c:bigint>"))
          .otherwise(acc)
      }).getField("c")

  /** Deterministic hyperplane component: LCG over (plane, dim),
    * centered to zero mean. Portable integer arithmetic.
    */
  def planeWeight(plane: Int, dim: Column, dims: Int): Column =
    ((lit(1103515245L) * (lit(plane.toLong * dims) + dim) + lit(12345L)) % lit(2000003L)) -
      lit(1000001L)

  /** Sign-LSH bucket id of a vector: bit `j` = sign of the dot product
    * with pseudo-random hyperplane `j`. 2^planes buckets.
    */
  def signLshBucket(vec: Column, planes: Int = 8, dims: Int = 64): Column =
    (0 until planes)
      .map { j =>
        val dotj = aggregate(
          zip_with(vec, sequence(lit(0), lit(dims - 1)),
            (x, d) => x.cast("double") * planeWeight(j, d, dims).cast("double")),
          lit(0.0), (s, v) => s + v)
        when(dotj > lit(0.0), lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** Reciprocal-rank fusion — the hybrid-retrieval combiner: each
    * input ranking contributes `2^20 div (c + rank)` to a candidate's
    * fused score (Cormack et al.'s 1/(c+r) on the integer grid —
    * 2^20 div (c+r) is PURE integer division, so the fused scores are
    * exact and engine-portable with no float anywhere), and the
    * result is the top-k by fused score. Because only RANKS cross the
    * fusion boundary, incomparable scorers (BM25 logits vs cosine)
    * combine without calibration — the reason RRF is the default
    * lexical+vector hybrid in production retrieval.
    *
    * Shape: the inputs are already top-k lists (metadata-sized); the
    * fusion is a union + one keyed aggregate over ≤ Σkᵢ rows, and the
    * final rank window sees at most k rows. Returns
    * (idCol, rrf_q, n_lists, rank).
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String = "rank",
      k: Int = 10,
      c: Int = 60): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    require(k >= 1 && c >= 1, "rrfFuse: k and c must be >= 1")
    val weighted = rankings
      .map(r => r.select(col(idCol),
        expr(s"CAST(1048576 div ($c + $rankCol) AS LONG)").as("_w")))
      .reduce(_ unionByName _)
    weighted.groupBy(col(idCol))
      .agg(sum(col("_w")).as("rrf_q"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_q").desc, col(idCol).asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_q").desc, col(idCol).asc)))
  }

  /** Exact brute-force cosine top-k: for each query row, the `k`
    * corpus rows (self excluded) with highest cosine. The query frame
    * must be small — it is broadcast so the corpus never shuffles; the
    * per-query top-k then reduces over `qid`.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("_qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("_cv"))
    val scored = c.join(q, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Pseudo-relevance-feedback retrieval (Rocchio query expansion,
    * β=1/α→0 form): round 1 retrieves each query's `fb` exact nearest
    * neighbors; the expanded query is the ELEMENT-WISE INTEGER SUM of
    * those neighbors' trunc(x·2^bits)-quantized vectors (cosine is
    * scale-invariant, so the sum IS the mean direction — and integer
    * sums are order-free, keeping the expansion engine-portable where
    * a float mean would depend on aggregation order); round 2 ranks
    * the corpus against the expanded vector. The recall rescue for
    * queries whose own embedding sits off the relevant cluster —
    * retrieval quality machinery the dense-index family (s1–s19)
    * doesn't cover.
    *
    * Returns (qid, cid, cosine, rank, was_feedback) for round-2 rank
    * ≤ k; `was_feedback` marks round-1 neighbors re-retrieved in
    * round 2 (the novelty-vs-anchoring audit column).
    *
    * Scale shape: queries broadcast in both rounds (an eval/serving
    * set, small by construction); the expansion folds ≤ fb·|queries|
    * collected arrays driver-free via a single groupBy; the corpus is
    * scanned narrow twice. At index scale, round 2 rides the same IVF
    * machinery as any other query set.
    */
  def prfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      fb: Int = 5,
      scaleBits: Int = 20): DataFrame = {
    require(k >= 1, "prfTopK: k must be >= 1")
    require(fb >= 1, "prfTopK: fb must be >= 1")
    require(scaleBits >= 0 && scaleBits <= 40, "prfTopK: scaleBits in [0, 40]")
    val scale = (1L << scaleBits).toDouble
    // r1 is metadata-sized (<= fb·|queries| rows) but its lineage is a
    // full corpus scan + rank window — persist so the expansion and
    // the was_feedback join don't each recompute round 1 (review
    // finding); lifecycle = the caller's clearCache
    val r1 = bruteForceTopK(corpus, queries, idCol, vecCol, fb)
      .select(col("qid"), col("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cq = corpus.select(col(idCol).as("cid"),
      transform(col(vecCol),
        x => (x.cast("double") * lit(scale)).cast("long")).as("_qv"))
    val expanded = r1.join(cq, Seq("cid"))
      .groupBy(col("qid"))
      .agg(collect_list(col("_qv")).as("_vs"))
      .select(col("qid"),
        aggregate(col("_vs"),
          transform(element_at(col("_vs"), 1), _ => lit(0L)),
          (acc, v) => zip_with(acc, v, (a, b) => a + b))
          .cast("array<double>").as("_ev"))
    val scored = corpus.select(col(idCol).as("cid"), col(vecCol).as("_cv"))
      .join(broadcast(expanded), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_ev"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .join(r1.withColumn("was_feedback", lit(true)), Seq("qid", "cid"), "left")
      .select(col("qid"), col("cid"), col("cosine"), col("rank"),
        coalesce(col("was_feedback"), lit(false)).as("was_feedback"))
  }

  /** Maximal-marginal-relevance (MMR) diversified retrieval
    * (Carbonell & Goldstein 1998): greedily select `k` of the top-`c`
    * candidates, each step maximizing `λ·rel(d) − (1−λ)·max_{s∈S}
    * sim(d, s)` — the de-duplicating re-rank that stops a result list
    * from being k near-copies of the same hit (plain top-k IS that
    * list on a redundant corpus). All arithmetic is EXACT integer:
    * relevance and pairwise similarity are dot products on the
    * trunc(x·2^bits) grid (unnormalized — the cosine-free formulation
    * avoids every float-tie hazard; for the near-unit-norm embedding
    * corpora this serves, dot order ≈ cosine order), λ in per-mille.
    * Ties break to the lower candidate position (= higher relevance,
    * then lower id).
    *
    * The greedy loop itself is a pure column expression — a nested
    * higher-order `aggregate` over the per-query candidate arrays —
    * so the operator stays fully distributed: one row per query
    * carries its `c` relevances and `c×c` similarity matrix
    * (metadata-sized by construction), and no driver loop or UDF
    * appears anywhere.
    *
    * Returns (qid, sel_rank, cid, rel_dot). Scale shape: queries
    * broadcast; candidate generation is the brute/IVF family's;
    * the candidate-pair similarities join `c·|queries|` rows against
    * the corpus by id.
    */
  def mmrTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      c: Int = 10,
      lambdaMilli: Int = 700,
      scaleBits: Int = 20): DataFrame = {
    require(k >= 1 && c >= k, "mmrTopK: need c >= k >= 1")
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      "mmrTopK: lambdaMilli in [0, 1000]")
    require(scaleBits >= 0 && scaleBits <= 24, "mmrTopK: scaleBits in [0, 24]")
    val scale = (1L << scaleBits).toDouble
    def qz(df: DataFrame, id: String, out: String) = df.select(
      col(idCol).as(id),
      transform(col(vecCol), x => (x.cast("double") * lit(scale)).cast("long"))
        .as(out))
    val cq = qz(corpus, "cid", "_cv")
    val qq = broadcast(qz(queries, "qid", "_qv"))
    val dot = (x: Column, y: Column) =>
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0L), (s, v) => s + v)
    // top-c candidates per query by exact integer dot, position 1..c
    val wr = Window.partitionBy("qid").orderBy(col("rel_dot").desc, col("cid").asc)
    val cand = cq.join(qq, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), dot(col("_qv"), col("_cv")).as("rel_dot"))
      .withColumn("p", row_number().over(wr)).filter(col("p") <= c)
    // candidate-pair similarity matrix per query (c² metadata rows)
    val withVec = cand.join(cq, Seq("cid"))
    val sims = withVec.select(col("qid"), col("p"), col("_cv")).as("a")
      .join(withVec.select(col("qid").as("qid2"), col("p").as("q"),
        col("_cv").as("_cv2")).as("b"), col("qid") === col("qid2"))
      .select(col("qid"), col("p"), col("q"),
        dot(col("_cv"), col("_cv2")).as("sim"))
    val perQuery = cand.groupBy(col("qid"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("rel_dot"),
        col("cid")))), e => e.getField("rel_dot")).as("rels"),
        transform(array_sort(collect_list(struct(col("p"), col("rel_dot"),
          col("cid")))), e => e.getField("cid")).as("cids"),
        count(lit(1)).as("_nc"))
      .join(sims.groupBy(col("qid"))
        .agg(transform(array_sort(collect_list(struct(col("p"), col("q"),
          col("sim")))), e => e.getField("sim")).as("simflat")), Seq("qid"))
    val sel = perQuery.withColumn("picked", expr(mmrFoldSql(k, lambdaMilli)))
    sel.select(col("qid"), col("rels"), col("cids"),
        posexplode(col("picked")).as(Seq("_i", "_p")))
      .select(col("qid"), (col("_i") + 1).cast("long").as("sel_rank"),
        element_at(col("cids"), col("_p")).as("cid"),
        element_at(col("rels"), col("_p")).as("rel_dot"))
  }

  /** The greedy MMR selection as a SQL expression over columns
    * `rels: array<long>`, `simflat: array<long>` (row-major c×c), and
    * `_nc: long`: a nested HOF fold — acc = picked 1-based positions;
    * each of the k steps scans all positions, skipping picked ones,
    * and keeps the best score (strict `>` keeps the FIRST maximum =
    * lowest position, the deterministic tie break; the `b.pos = -1`
    * disjunct makes the FIRST unpicked candidate win outright, so the
    * argmax can never fall through to the sentinel even if every real
    * score underflows the seed — `element_at(cids, -1)` would
    * otherwise silently select the LAST candidate, Spark's negative
    * indices counting from the end). Exposed so the
    * property suite pins THIS expression — not a copy — against a
    * reference Scala greedy on random pools.
    */
  private[graft] def mmrFoldSql(k: Int, lambdaMilli: Int): String = {
    val lam = lambdaMilli.toLong
    val mu = (1000 - lambdaMilli).toLong
    s"""aggregate(
       |  sequence(1, least($k, _nc)),
       |  CAST(array() AS ARRAY<INT>),
       |  (acc, step) -> acc || array(
       |    aggregate(
       |      sequence(1, CAST(_nc AS INT)),
       |      named_struct('s', CAST(-4611686018427387904 AS BIGINT), 'pos', -1),
       |      (b, p) -> CASE WHEN array_contains(acc, p) THEN b ELSE (
       |        CASE WHEN b.pos = -1 OR ($lam * element_at(rels, p)
       |                   - $mu * coalesce(array_max(transform(acc,
       |                       q -> element_at(simflat, (p - 1) * CAST(_nc AS INT) + q))), 0L))
       |                  > b.s
       |             THEN named_struct('s',
       |                    $lam * element_at(rels, p)
       |                    - $mu * coalesce(array_max(transform(acc,
       |                        q -> element_at(simflat, (p - 1) * CAST(_nc AS INT) + q))), 0L),
       |                  'pos', p)
       |             ELSE b END) END).pos))""".stripMargin
  }

  /** kNN label probe — the standard embedding-quality evaluation: each
    * labeled query is classified by the majority label of its `k`
    * nearest corpus neighbors (exact cosine, self excluded; vote ties
    * break to the smaller label, the same determinism discipline as
    * the rank tie-break), and each output row carries prediction vs
    * the query's own label. Null-labeled rows are excluded on both
    * sides — they can neither vote nor be scored.
    *
    * Scale shape: the probe set is small by construction (an eval
    * sample), so it broadcasts; the corpus is scanned once, narrow,
    * and only candidate rows reach the vote — the vote itself runs
    * over ≤ k·|queries| rows. Output (qid, true_label, pred_label,
    * votes, correct).
    */
  def knnLabelProbe(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "knnLabelProbe: k must be >= 1")
    val c = corpus.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("cid"), col(vecCol).as("_cv"),
        col(labelCol).cast("long").as("_cl"))
    val q = broadcast(queries.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"),
        col(labelCol).cast("long").as("_ql")))
    val scored = c.join(q, col("qid") =!= col("cid"))
      .select(col("qid"), col("_ql"), col("cid"), col("_cl"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
    majorityVote(scored, k)
  }

  /** [[knnLabelProbe]] riding the IVF index — the 100 TB tier: corpus
    * cell assignment is the narrow argmax fold, queries probe their
    * `nprobe` nearest cells, candidates come from the cell equi-join
    * (never a corpus cross join), and the vote runs over
    * ≤ k·|queries| rows. Same contract otherwise (null labels out,
    * vote ties → smaller label); recall follows the index
    * ([[ivfTopK]]'s s9 recall report sizes the nprobe knob for it).
    */
  def knnLabelProbeIvf(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      nprobe: Int = 1): DataFrame = {
    require(k >= 1 && nprobe >= 1, "knnLabelProbeIvf: k and nprobe must be >= 1")
    val centArr = centroidLiteral(centroids, idCol, vecCol)
    val c = corpus.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("cid"), col(vecCol).as("_cv"),
        col(labelCol).cast("long").as("_cl"))
      .withColumn("_cell", argmaxCell(col("_cv"), centArr))
      .filter(col("_cell") >= 0)
    val q = queries.filter(col(labelCol).isNotNull)
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"),
        col(labelCol).cast("long").as("_ql"))
      // cell array materialized BELOW the Generate (the tx4 rule)
      .withColumn("_cells", topCells(col("_qv"), centArr, nprobe))
      .select(col("qid"), col("_qv"), col("_ql"), explode(col("_cells")).as("_cell"))
    val scored = c.join(broadcast(q), Seq("_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("_ql"), col("cid"), col("_cl"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
    majorityVote(scored, k)
  }

  /** Shared vote kernel: rank candidates (cosine desc, cid asc), keep
    * k, majority label per query (ties → smaller label). Input rows
    * (qid, _ql, cid, _cl, cosine); output (qid, true_label,
    * pred_label, votes, correct).
    */
  private def majorityVote(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    val neighbors = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val votes = neighbors.groupBy("qid", "_ql", "_cl")
      .agg(count(lit(1)).as("votes"))
    val vw = Window.partitionBy("qid").orderBy(col("votes").desc, col("_cl").asc)
    votes.withColumn("_vr", row_number().over(vw)).filter(col("_vr") === 1)
      .select(col("qid"), col("_ql").as("true_label"), col("_cl").as("pred_label"),
        col("votes"),
        (col("_ql") === col("_cl")).cast("long").as("correct"))
  }

  /** ANN via IVF (inverted-file) cells: a coarse quantizer of
    * `centroids` rows partitions the corpus — every vector is assigned
    * to its nearest centroid (argmax cosine, ties to the lowest
    * centroid id) and queries probe only their own cell. The classic
    * billion-scale layout (IVF-Flat): the quantizer is tiny metadata
    * (FAISS ships it to every worker the same way), so assignment is a
    * *narrow per-row argmax* — a fold over a centroid array literal
    * embedded in the plan. Zero Exchange before the cell-probe join:
    * no N×C shuffle, no window sort, the corpus never moves.
    *
    * Contract: centroid ids must be numeric (castable to long) and
    * non-null — validated eagerly with a clear error. A zero-norm
    * corpus/query vector has NaN cosine against every centroid, so the
    * assignment fold keeps the sentinel cell -1: such rows match no
    * cell and drop out of the result (they are unsearchable under
    * cosine distance — there is no meaningful nearest neighbor).
    */
  /** Top-`nprobe` cells of a vector by cosine against the centroid
    * literal (ties → lower cell id), as an array — the FAISS `nprobe`
    * recall knob: probing several nearby cells recovers neighbors that
    * straddle a cell boundary. Sorting the k-element centroid array is
    * per-row work bounded by nlist, and only the (small) query side
    * pays it. NaN cosines (zero-norm) sort to the tail and are cut.
    */
  def topCells(vec: Column, centArr: Column, nprobe: Int): Column =
    slice(
      transform(
        array_sort(filter(
          transform(centArr, ct =>
            struct((-cosine(vec, ct.getField("ce"))).as("nc"),
              ct.getField("c").as("c"))),
          s => !isnan(s.getField("nc")))),
        s => s.getField("c")),
      1, nprobe)

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = ivfTopK(corpus, queries, centroids, idCol, vecCol, k, nprobe = 1)

  /** [[ivfTopK]] with the `nprobe` recall knob: each query probes its
    * `nprobe` nearest cells (corpus rows still live in exactly one
    * cell — the index layout is unchanged, only the query fan-out
    * grows, still an equi-join on the cell).
    */
  /** Coarse quantizer → validated array literal of struct(c, ce),
    * ascending cell id — driver metadata bounded by nlist (≤ ~64k
    * cells, the standard IVF contract), shared by [[ivfTopK]] and
    * [[ivfPqTopK]] so the validation can't drift. Element type
    * honored: float and double embedding columns both work.
    */
  private[pipeline] def centroidLiteral(
      centroids: DataFrame,
      idCol: String,
      vecCol: String): Column = {
    val isFloat = centroids.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val cents = centroids.select(col(idCol).cast("long").as("_c"), col(vecCol).as("_ce"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"IVF centroid id column '$idCol' must be numeric and non-null " +
            "(a non-numeric or null id casts to NULL)")
        val v = r.getSeq[Any](1)
        require(v != null && !v.contains(null),
          s"IVF centroid vector column '$vecCol' must be non-null with no null elements")
        (r.getLong(0), v)
      }
      .sortBy(_._1)
    require(cents.nonEmpty, "IVF needs a non-empty centroid set (the coarse quantizer)")
    array(cents.toIndexedSeq.map { case (cid, v) =>
      val ce =
        if (isFloat) typedLit(v.map(x => x.asInstanceOf[Float]))
        else typedLit(v.map(x => x.asInstanceOf[Double]))
      struct(lit(cid).as("c"), ce.as("ce"))
    }: _*)
  }

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val centArr = centroidLiteral(centroids, idCol, vecCol)
    def assign(df: DataFrame, outId: String, outVec: String): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as(outVec))
        .withColumn("_cell", argmaxCell(col(outVec), centArr))
        // sentinel rows match no cell (without the filter, -1 corpus
        // rows would equi-join -1 query rows)
        .filter(col("_cell") >= 0)
    val c = assign(corpus, "cid", "_cv")
    val q =
      if (nprobe <= 1) assign(queries, "qid", "_qv")
      else queries
        .select(col(idCol).as("qid"), col(vecCol).as("_qv"))
        // cell array materialized BELOW the Generate (see tx4 note)
        .withColumn("_cells", topCells(col("_qv"), centArr, nprobe))
        .select(col("qid"), col("_qv"), explode(col("_cells")).as("_cell"))
    val scored = c.join(broadcast(q), Seq("_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: each anchor's
    * top-`k` most-similar corpus vectors with a DIFFERENT label — the
    * near-misses that carry the contrastive gradient (a random
    * negative is trivially far and teaches nothing; the hard ones sit
    * right at the decision boundary). The label predicate is
    * PER-PAIR (anchor label ≠ candidate label), which no static
    * corpus pre-filter can express — contrast s14's filtered ANN,
    * where the filter is a property of the candidate alone.
    *
    * Same scale shape as [[ivfTopK]]: candidates come from the IVF
    * cell equi-join (anchors broadcast with `nprobe` fan-out, corpus
    * rows touched only within probed cells — never a cross join), the
    * label ride-along adds one small column to each side, and the
    * mismatch filter runs before the per-anchor top-k window.
    * Null-labeled rows never pair (no label evidence, SQL null
    * semantics on both engines).
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      nprobe: Int = 1): DataFrame = {
    require(k >= 1, "hardNegatives: k must be >= 1")
    require(nprobe >= 1, "hardNegatives: nprobe must be >= 1")
    val centArr = centroidLiteral(centroids, idCol, vecCol)
    def assign(df: DataFrame, outId: String, outVec: String, outLab: String) =
      df.select(col(idCol).as(outId), col(vecCol).as(outVec),
          col(labelCol).as(outLab))
        .withColumn("_cell", argmaxCell(col(outVec), centArr))
        .filter(col("_cell") >= 0)
    val c = assign(corpus, "cid", "_cv", "_cl")
    val q =
      if (nprobe <= 1) assign(queries, "qid", "_qv", "_ql")
      else queries
        .select(col(idCol).as("qid"), col(vecCol).as("_qv"),
          col(labelCol).as("_ql"))
        .withColumn("_cells", topCells(col("_qv"), centArr, nprobe))
        .select(col("qid"), col("_qv"), col("_ql"),
          explode(col("_cells")).as("_cell"))
    val scored = c.join(broadcast(q), Seq("_cell"))
      .filter(col("qid") =!= col("cid") && col("_ql") =!= col("_cl"))
      .select(col("qid"), col("cid"),
        cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- Product quantization (ADC) ---------------------------------------

  /** PQ codebooks: the embedding space is split into `m` contiguous
    * subspaces and each subspace gets `k` codewords — the subvector
    * slices of the k hash-seeded sample rows ([[Clustering.seedCentroids]]:
    * smallest portable id-hash, ties by id). Deterministic and
    * engine-reproducible, like every quantizer here; refine with
    * subspace Lloyd rounds offline if recall demands it. Returns
    * codebooks(j) = Array of (code 0..k-1, codeword) for subspace j —
    * m·k·(dims/m) doubles of driver metadata (FAISS ships the same
    * codebook to every worker).
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int): Array[Array[(Long, Seq[Double])]] = {
    val seeds = Clustering.seedCentroids(corpus, idCol, vecCol, k)
    require(seeds.nonEmpty, "pqCodebooks: empty corpus")
    val dims = seeds.head._2.length
    require(dims % m == 0, s"pqCodebooks: $m subspaces must divide $dims dims")
    val sub = dims / m
    Array.tabulate(m)(j =>
      seeds.map { case (c, v) => (c, v.slice(j * sub, (j + 1) * sub)) })
  }

  /** PQ code columns `_c0.._c{m-1}` for a vector column: per subspace,
    * the argmax-cosine codeword id (ties to the lowest code, sentinel
    * -1 when the subvector is zero-norm — NaN against every codeword).
    * A pure narrow per-row fold over codebook literals — zero
    * Exchange; at 100 TB this turns a 256-byte float vector into m
    * bytes of codes, the compressed representation every billion-scale
    * ANN index actually stores.
    */
  def pqCodeColumns(vec: Column, codebooks: Array[Array[(Long, Seq[Double])]]): Seq[Column] = {
    val sub = codebooks(0)(0)._2.length
    codebooks.toIndexedSeq.zipWithIndex.map { case (cb, j) =>
      val centArr = array(cb.toIndexedSeq.map { case (c, v) =>
        struct(lit(c).as("c"), typedLit(v).as("ce"))
      }: _*)
      argmaxCell(slice(vec, j * sub + 1, sub), centArr).as(s"_c$j")
    }
  }

  /** (id, subspace, code) PQ encoding of a corpus — the catalog-facing
    * entry point. Rows keep their sentinel -1 codes so the output
    * domain is exactly corpus × subspaces.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[(Long, Seq[Double])]]): DataFrame =
    corpus
      // codes materialized BELOW the Generate — inlined into
      // posexplode the folds would evaluate interpreted, per element
      .select(col(idCol) +: pqCodeColumns(col(vecCol), codebooks): _*)
      .select(col(idCol),
        posexplode(array(codebooks.indices.map(j => col(s"_c$j")): _*))
          .as(Seq("m", "code")))

  /** ANN via PQ asymmetric distance computation: corpus vectors are
    * replaced by their codebook reconstruction (concatenated codeword
    * slices — m codes, not dims floats), queries stay exact, and the
    * score is the cosine between the exact query and the
    * reconstruction. The corpus side is a narrow encode+reconstruct
    * projection (no Exchange before scoring); queries broadcast like
    * [[bruteForceTopK]]. Corpus rows with any zero-norm subvector
    * (sentinel code) are unsearchable and drop out, like [[ivfTopK]]'s
    * sentinel rows. Compose with IVF cells to prune the scan at scale
    * (IVF-PQ); this is the ADC kernel of that layout.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      codebooks: Array[Array[(Long, Seq[Double])]]): DataFrame = {
    val m = codebooks.length
    val recon = concat(codebooks.toIndexedSeq.zipWithIndex.map { case (cb, j) =>
      val cbArr = array(cb.toIndexedSeq.map { case (_, v) => typedLit(v) }: _*)
      element_at(cbArr, (col(s"_c$j") + lit(1)).cast("int"))
    }: _*)
    val enc = corpus
      .select(col(idCol).as("cid") +: pqCodeColumns(col(vecCol), codebooks): _*)
      .filter((0 until m).map(j => col(s"_c$j") >= 0).reduce(_ && _))
      .select(col("cid"), recon.as("_rv"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("_qv")))
    val scored = enc.join(q, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_rv")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-PQ: the two quantizers composed — corpus and queries are
    * assigned to coarse IVF cells (narrow argmax over the centroid
    * literal, zero Exchange), the corpus is PQ-encoded and scored
    * against the exact query via its codebook reconstruction (ADC),
    * and candidates are same-cell only. This is the billion-scale
    * layout FAISS calls IVFPQ: the index stores m bytes per vector,
    * a query touches ~N/nlist of them, and both quantizers are plan
    * metadata shipped to every worker. Sentinel rows (zero-norm
    * vector or subvector) are unsearchable and drop out, as in
    * [[ivfTopK]] / [[pqTopK]].
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      codebooks: Array[Array[(Long, Seq[Double])]]): DataFrame = {
    val m = codebooks.length
    val centArr = centroidLiteral(centroids, idCol, vecCol)
    val recon = concat(codebooks.toIndexedSeq.zipWithIndex.map { case (cb, j) =>
      val cbArr = array(cb.toIndexedSeq.map { case (_, v) => typedLit(v) }: _*)
      element_at(cbArr, (col(s"_c$j") + lit(1)).cast("int"))
    }: _*)
    val enc = corpus
      .select(col(idCol).as("cid") +:
        argmaxCell(col(vecCol), centArr).as("_cell") +:
        pqCodeColumns(col(vecCol), codebooks): _*)
      .filter(col("_cell") >= 0 && (0 until m).map(j => col(s"_c$j") >= 0).reduce(_ && _))
      .select(col("cid"), col("_cell"), recon.as("_rv"))
    val q = queries
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"),
        argmaxCell(col(vecCol), centArr).as("_cell"))
      .filter(col("_cell") >= 0)
    val scored = enc.join(broadcast(q), Seq("_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_rv")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Two-stage ANN: PQ asymmetric-distance recall then exact re-rank —
    * the production billion-scale shape (FAISS `IVFPQ + refine`). Stage
    * 1 scans compressed codes only (m bytes/vector) and keeps
    * `kCoarse ≥ k` candidates per query; stage 2 fetches ONLY the
    * candidates' exact vectors (|Q|·kCoarse rows — broadcast-sized by
    * construction, so the fetch is a broadcast semi-join against the
    * corpus, never a shuffle of it) and re-ranks by exact cosine. The
    * compression error PQ introduces is confined to candidate CHOICE;
    * reported scores are exact.
    */
  def pqRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      kCoarse: Int,
      codebooks: Array[Array[(Long, Seq[Double])]]): DataFrame = {
    require(kCoarse >= k, s"re-rank pool $kCoarse must cover k=$k")
    val cand = pqTopK(corpus, queries, idCol, vecCol, kCoarse, codebooks)
      .select(col("qid"), col("cid"))
    val exact = corpus.select(col(idCol).as("cid"), col(vecCol).as("_cv"))
      .join(broadcast(cand), Seq("cid"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("_qv")))
    val scored = exact.join(q, Seq("qid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- Index persistence (build once, serve many) ------------------------

  /** Handle to a persisted IVF(-PQ) index: `cells` is the
    * cell-partitioned corpus (one parquet partition directory per IVF
    * cell — a query probing `nprobe` cells reads only those
    * directories; at 100 TB that is the difference between touching
    * N/nlist vectors and re-scanning the corpus), `quantizer` is the
    * coarse-centroid table, `codebooks` the PQ codebooks (empty for
    * IVF-Flat). Quantizer and codebooks are driver metadata, exactly
    * what [[ivfTopK]]/[[ivfPqTopK]] ship as plan literals.
    */
  final case class AnnIndex(
      cells: DataFrame,
      quantizer: DataFrame,
      codebooks: Option[Array[Array[(Long, Seq[Double])]]])

  /** Build and persist an IVF(-Flat or -PQ) index under `path`:
    *  - `path/cells`: the corpus assigned to its coarse cell
    *    (`cid`, `vec`, PQ codes `_c0.._c{m-1}` when codebooks are
    *    given), written `partitionBy("cell")` — the inverted-file
    *    layout on disk. Unsearchable rows (zero-norm vector or, for
    *    PQ, any zero-norm subvector) are excluded at build time, the
    *    same rows [[ivfTopK]]/[[ivfPqTopK]] drop.
    *  - `path/quantizer`: the centroid table (`c`, `ce`).
    *  - `path/codebooks` (PQ only): rows (`m`, `code`, `pos`, `w`) —
    *    the codeword components in subspace-position order.
    * The expensive part (one corpus scan + one shuffle-by-cell write)
    * runs once; every later session serves from the files.
    */
  def saveIndex(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      codebooks: Option[Array[Array[(Long, Seq[Double])]]] = None): Unit = {
    val spark = corpus.sparkSession
    val centArr = centroidLiteral(centroids, idCol, vecCol)
    val codeCols = codebooks.map(cb => pqCodeColumns(col(vecCol), cb)).getOrElse(Seq.empty)
    val searchable = codebooks match {
      case Some(cb) => cb.indices.map(j => col(s"_c$j") >= 0).reduce(_ && _)
      case None     => lit(true)
    }
    corpus
      .select(Seq(col(idCol).as("cid"), col(vecCol).as("vec"),
        argmaxCell(col(vecCol), centArr).as("cell")) ++ codeCols: _*)
      .filter(col("cell") >= 0 && searchable)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    centroids
      .select(col(idCol).cast("long").as("c"), col(vecCol).as("ce"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/quantizer")
    codebooks.foreach { cbs =>
      import spark.implicits._
      val rows = for {
        (cb, j) <- cbs.toIndexedSeq.zipWithIndex
        (code, v) <- cb
        (w, pos) <- v.zipWithIndex
      } yield (j, code, pos, w)
      rows.toDF("m", "code", "pos", "w")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    }
  }

  /** Append new vectors to a PERSISTED index without rebuilding it:
    * the saved quantizer (and codebooks, for PQ) are loaded as driver
    * metadata, the new batch is assigned/encoded with exactly the
    * machinery [[saveIndex]] used, and the rows are appended into the
    * same `partitionBy("cell")` layout — new parquet files land inside
    * the existing cell directories.
    *
    * Because assignment is per-row against the SAME frozen quantizer,
    * append-then-query is bit-equal to a from-scratch [[saveIndex]]
    * over the union (the s13 gate pins this). This is the "documents
    * arrive daily" path: each increment costs one scan of the delta +
    * one shuffle-by-cell write, never a touch of the existing cells.
    * Centroid drift is the hot-swap path's job ([[graft.streaming.HotAnnIndex]]) —
    * maintenance (append) and re-optimization (re-quantize) stay
    * separate operations, as in any IVF deployment.
    */
  def addToIndex(
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Unit = {
    val spark = newVectors.sparkSession
    val idx = loadIndex(spark, path)
    val centArr = centroidLiteral(idx.quantizer, "c", "ce")
    val codeCols = idx.codebooks
      .map(cb => pqCodeColumns(col(vecCol), cb)).getOrElse(Seq.empty)
    val searchable = idx.codebooks match {
      case Some(cb) => cb.indices.map(j => col(s"_c$j") >= 0).reduce(_ && _)
      case None     => lit(true)
    }
    newVectors
      .select(Seq(col(idCol).as("cid"), col(vecCol).as("vec"),
        argmaxCell(col(vecCol), centArr).as("cell")) ++ codeCols: _*)
      .filter(col("cell") >= 0 && searchable)
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Load a persisted index. Cells stay lazy (a DataFrame over the
    * partitioned layout — nothing is scanned until a query probes);
    * quantizer and codebooks are re-materialized as driver metadata.
    * The partition-column `cell` is cast back to long (partition
    * discovery infers int).
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): AnnIndex = {
    val cells = spark.read.parquet(s"$path/cells")
      .withColumn("cell", col("cell").cast("long"))
    val quantizer = spark.read.parquet(s"$path/quantizer")
    // resolve the FS from the path itself (the stateSnapshot lesson):
    // FileSystem.get(conf) is the DEFAULT filesystem, which mis-probes
    // an index saved to s3a://... when defaultFS is file:// or hdfs://
    val cbPath = new org.apache.hadoop.fs.Path(s"$path/codebooks")
    val fs = cbPath.getFileSystem(spark.sessionState.newHadoopConf())
    val codebooks =
      if (!fs.exists(cbPath)) None
      else Some {
        val rows = spark.read.parquet(s"$path/codebooks")
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        val m = rows.map(_._1).max + 1
        Array.tabulate(m) { j =>
          rows.filter(_._1 == j)
            .groupBy(_._2)
            .map { case (code, comps) =>
              (code, comps.sortBy(_._3).map(_._4).toSeq)
            }
            .toArray.sortBy(_._1)
        }
      }
    AnnIndex(cells, quantizer, codebooks)
  }

  /** Serve a top-k query from a loaded [[AnnIndex]] — IVF-Flat (exact
    * cosine on stored vectors) when the index has no codebooks, ADC
    * over the stored PQ codes when it does. Same candidate set, same
    * tie order, bit-identical scores as the in-session
    * [[ivfTopK]]/[[ivfPqTopK]] over the same corpus: the gate pins
    * this. Queries are assigned via the loaded quantizer (narrow
    * argmax) and broadcast; the cell equi-join prunes the scan to the
    * probed partition directories.
    */
  /** Metadata-filtered serving over a saved index, compositionally:
    * restrict the cell frame to the allowed ids (left-semi on the
    * broadcastable allow-frame) BEFORE any scoring — exact filtered
    * top-k (post-filtering a top-k is NOT: a query's k best allowed
    * rows may all sit below its unfiltered top-k). Partition pruning
    * to probed cells still applies — the semi-join composes above the
    * pruned scan, and Catalyst/AQE broadcasts the allow-frame when it
    * is small (no forced hint: a tenant-sized allow-list broadcasts, a
    * half-corpus one shuffle-joins instead of OOMing the driver).
    */
  def filterIndex(index: AnnIndex, allowedIds: DataFrame, idCol: String): AnnIndex =
    index.copy(cells = index.cells.join(
      allowedIds.select(col(idCol).cast("long").as("cid")).distinct(),
      Seq("cid"), "left_semi"))

  def queryIndex(
      index: AnnIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 1): DataFrame = {
    val centArr = centroidLiteral(index.quantizer, "c", "ce")
    val q0 = queries.select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val q =
      if (nprobe <= 1)
        q0.withColumn("_cell", argmaxCell(col("_qv"), centArr)).filter(col("_cell") >= 0)
      else q0
        .withColumn("_cells", topCells(col("_qv"), centArr, nprobe))
        .select(col("qid"), col("_qv"), explode(col("_cells")).as("_cell"))
    val scoreName = if (index.codebooks.isDefined) "score" else "cosine"
    val c = index.codebooks match {
      case None =>
        index.cells.select(col("cid"), col("vec").as("_sv"), col("cell").as("_cell"))
      case Some(cbs) =>
        val recon = concat(cbs.toIndexedSeq.zipWithIndex.map { case (cb, j) =>
          val cbArr = array(cb.toIndexedSeq.map { case (_, v) => typedLit(v) }: _*)
          element_at(cbArr, (col(s"_c$j") + lit(1)).cast("int"))
        }: _*)
        index.cells.select(col("cid"), recon.as("_sv"), col("cell").as("_cell"))
    }
    val scored = c.join(broadcast(q), Seq("_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_sv")).as(scoreName))
    val w = Window.partitionBy("qid").orderBy(col(scoreName).desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ANN via sign-LSH buckets: candidates are same-bucket corpus rows;
    * otherwise identical shape to [[bruteForceTopK]]. Approximate —
    * recall depends on `planes` (fewer planes = bigger buckets =
    * higher recall and cost). Multi-probe: also probes the `probes`
    * single-bit-flip neighbor buckets of each query to recover
    * borderline misses.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 8,
      dims: Int = 64,
      probes: Int = 0): DataFrame = {
    val c = corpus.select(
      col(idCol).as("cid"), col(vecCol).as("_cv"),
      signLshBucket(col(vecCol), planes, dims).as("_bk"))
    val qb = queries.select(
      col(idCol).as("qid"), col(vecCol).as("_qv"),
      signLshBucket(col(vecCol), planes, dims).as("_b0"))
    val probed = qb.select(
      col("qid"), col("_qv"),
      explode(array((col("_b0") +: (0 until probes).map(j =>
        col("_b0").bitwiseXOR(lit(1L << j)))): _*)).as("_bk"))
      .dropDuplicates("qid", "_bk")
    val scored = c.join(broadcast(probed), Seq("_bk"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("_qv"), col("_cv")).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
