package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions.{polyHash, tokens, P}

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the point of each shape):
  *  - nothing here ever does an all-pairs O(N²) comparison on the full
  *    corpus: candidate pairs always come from an *inverted-index /
  *    bucket equi-join* (shingle, LSH band bucket, SimHash byte-block,
  *    sign-LSH bucket), which Spark executes as an ordinary shuffled
  *    hash join keyed on the bucket — linear shuffle, parallel probe;
  *  - hot buckets are the classic skew hazard: `maxDocFreq` drops
  *    shingles shared by more than that many docs (stopword shingles
  *    contribute no discriminative signal but O(df²) pairs). AQE skew
  *    handling splits what remains;
  *  - signatures (minhash/simhash/fingerprint) are computed in one
  *    narrow codegen'd pass over the corpus — per-doc cost is O(len),
  *    no shuffle until the tiny (id, sig) projection is joined.
  *
  * Every operator is expressible in portable SQL (see
  * [[graft.PipelineQueries]]) so the DuckDB oracle can verify results
  * exactly — including hash values, thanks to the shared portable
  * polynomial hash (no murmur3 dependence).
  */
object Dedup {

  /** Several operators here persist a reused corpus-scale intermediate
    * (shingle-hash / signature frames) so the multi-join plans don't
    * recompute the text scan per consumer. Spark's CacheManager holds
    * those plans strongly, so a LONG-LIVED session embedding this
    * library (a gateway, a notebook) must release them once the
    * returned frames are materialized: call [[releaseCaches]] — it is
    * precise, unpersisting only frames this object persisted — or the
    * blunt `spark.catalog.clearCache()` (what Verify/Bench do between
    * queries). Unreleased frames are NOT a correctness hazard, only
    * held cache storage.
    */
  private val trackedCaches =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Persist an intermediate at the measured-best level and register
    * it for [[releaseCaches]]. MEMORY_AND_DISK, not `_SER`: the SQL
    * cache stores compressed columnar batches already, so `_SER` only
    * adds a second serialization layer (measured +0.15 s, nothing
    * saved).
    */
  private def trackPersist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    trackedCaches.add(df)
    df
  }

  /** Unpersist every intermediate [[Dedup]] has cached since the last
    * release (non-blocking). Safe at any time: materialized results
    * stay valid; unmaterialized plans simply recompute.
    */
  def releaseCaches(): Unit = {
    trackedCaches.forEach(df => df.unpersist(false))
    trackedCaches.clear()
  }

  /** Corpus-side fan-out before a per-row compute stage
    * (r15 optimization, guide §2.5): a one-file input otherwise runs
    * the fused per-row compute as a single task — see
    * [[graft.core.Tables.fanOut]] (no-op on well-split inputs, i.e.
    * at corpus scale). Row-set-identical; consumers aggregate or
    * set-join, so row placement carries no meaning.
    *
    * Applied ONLY where a paired same-box A/B won: containmentPairs
    * (full shingle-hash SETS kept per row — heavy build + array
    * intersect verify; 2.99 → 2.53 s at sf0.1). Measured and REJECTED
    * for the signature paths (minhashMembers 1.2 → 3.9 s, simhash
    * d11 1.5 → 2.1 s, jaccard/winnow/shingleIndex/profile washes):
    * their per-row signatures are cheap relative to the exchange the
    * fan adds, and the single-partition input lets the first partial
    * aggregate collapse map-side for free.
    */
  private def fan(df: DataFrame): DataFrame = graft.core.Tables.fanOut(df)

  /** Word n-gram shingle set (distinct) of a text column. Texts with
    * fewer than `n` tokens shingle to the empty set (guarded: Spark's
    * `sequence(1, k)` for k<1 would generate a *descending* range).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    val grams = transform(
      sequence(lit(1), size(w) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(w, i + lit(o))): _*))
    array_distinct(when(size(w) >= lit(n), grams).otherwise(array().cast("array<string>")))
  }

  /** Distinct shingle HASHES — fused one-pass kernel (prefix
    * polynomial hashes over the raw text, O(len) per doc). Value-equal
    * to `array_distinct(transform(shingles(text, n), polyHash))`
    * (parity-tested); the shingle strings are never materialized.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.functions.NativeExpressions.shingleHashes(text, n)

  /** Exact dedup summary: one row per distinct text with the kept
    * (minimum) id and the duplicate count. Single hash-aggregate
    * shuffle on the text; at 100 TB group on `hash` of the text first
    * and only compare full texts within hash groups (the grouping here
    * is by the text value itself — Spark hashes it internally anyway).
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the minimum-id row per distinct text. One
    * shuffle (hash aggregate with map-side partial min).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(keep, idCol) // broadcast-able when the dup summary is small
  }

  /** Exact-dedup summary via the HASH-FIRST two-phase plan — the
    * 100 TB shape [[exactGroups]]' scaladoc points at: phase 1
    * aggregates (min id, count) per 64-bit portable text hash, so the
    * corpus-wide exchange moves 8-byte keys and ids, never document
    * text; phase 2 re-examines ONLY docs whose hash has multiplicity
    * > 1 (true duplicates plus astronomically rare collisions) with an
    * exact text compare — a broadcast semi-join steers the colliding
    * slice into one small text shuffle. Result-identical to
    * [[exactGroups]] minus the text column (exact verification means
    * collisions never merge distinct texts). Regime note: the
    * broadcast multi-hash set is bounded by the DISTINCT duplicated
    * hash count — on a duplicate-DOMINATED corpus where that set is
    * itself huge, use [[exactGroups]] (text shuffles once either way
    * there, and map-side partials already collapse repeats).
    */
  def exactGroupsByHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val withH = df.select(col(idCol).as("_id"), col(textCol).as("_t"),
      graft.functions.TextFunctions.polyHash(col(textCol)).as("_h"))
    val perHash = withH.groupBy("_h")
      .agg(min(col("_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    val single = perHash.filter(col("n_dups") === 1).select("keep_id", "n_dups")
    val multiHashes = perHash.filter(col("n_dups") > 1).select("_h")
    val collide = withH.join(broadcast(multiHashes), Seq("_h"), "left_semi")
      .groupBy("_h", "_t")
      .agg(min(col("_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
    single.unionAll(collide)
  }

  /** Inverted index (id, shingle-hash) with document-frequency cap —
    * the candidate generator for [[jaccardPairs]]. Shingles are
    * hashed to longs BEFORE the index is materialized: the self-join
    * shuffles and compares 8-byte keys instead of ~20-byte strings
    * (same result both engines — the oracle hashes identically; hash
    * collisions are deterministic and astronomically rare vs the
    * shingle universe).
    */
  def shingleIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDocFreq: Long = 100): DataFrame = {
    val idx = df
      .select(col(idCol).as("_id"), explode(shingleHashes(col(textCol), n)).as("_sh"))
    val rare = idx.groupBy("_sh").count().filter(col("count") <= maxDocFreq).drop("count")
    idx.join(rare, "_sh") // drops degenerate hot shingles (skew guard)
  }

  /** N-gram Jaccard near-dup pairs above `threshold`, PPJoin-style:
    * candidates come from a *prefix* inverted index — each doc indexes
    * only its `|d| - ceil(t·|d|) + 1` globally-rarest shingles (rarity
    * order: doc-frequency asc, hash asc). Any pair with J >= t must
    * share a prefix shingle (pigeonhole), so the self-join touches
    * ~20% of the index at t=0.8 and an order of magnitude fewer join
    * rows than the full index (measured 1.27M → 118k at sf0.1).
    * Candidates are then verified exactly with a set intersection of
    * the full shingle-hash arrays. Never all-pairs, never unverified.
    */
  /** Asymmetric containment pairs: the SUBSET duplication detector.
    * `C(A→B) = |S_A ∩ S_B| / |S_A|` is ~1 when A's shingles sit
    * inside B — a doc quoted whole inside a bigger page, a partial
    * scrape, a wrapper — exactly the pairs symmetric Jaccard
    * structurally misses (`J ≤ |A|/|B|`, vanishing as the host
    * grows, so no Jaccard threshold can see a small doc inside a
    * large one). Emits each unordered pair once with BOTH directions'
    * integer milli-containments; keep rule `max(C₁,C₂) ≥ t` is the
    * cross-multiplication `inter·1000 ≥ t·min(n₁,n₂)`.
    *
    * Scale shape: inverted shingle-hash index with a document-
    * frequency cap — a gram in more than `maxDf` docs is boilerplate
    * (its inverted list alone would generate O(maxDf²) candidates and
    * carries no discriminative signal), so candidates must share at
    * least one sub-cap gram; the containment itself is then verified
    * EXACTLY on the full hash sets. That candidate contract is part
    * of the operator's semantics (deterministic, oracle-replayable),
    * not a lossy shortcut bolted on.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      tMilli: Int = 500,
      maxDf: Int = 1000): DataFrame = {
    require(tMilli >= 1 && tMilli <= 1000, "containmentPairs: tMilli in [1, 1000]")
    require(maxDf >= 1, "containmentPairs: maxDf >= 1")
    val hs = trackPersist(
      fan(df).select(col(idCol).as("_id"), shingleHashes(col(textCol), n).as("_hset"))
        .withColumn("_n", size(col("_hset")))
        .filter(col("_n") >= 1))
    val idx = hs.select(col("_id"), explode(col("_hset")).as("_sh"))
    val rare = idx.groupBy(col("_sh")).agg(count(lit(1)).as("_f"))
      .filter(col("_f") <= maxDf).select(col("_sh"))
    // persisted: BOTH self-join sides read this frame — unpersisted,
    // each side re-derives the explode AND the df-cap aggregate's
    // corpus-scale shuffle (measured on the d18 gate row)
    val capped = trackPersist(idx.join(rare, "_sh"))
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a._sh") === col("b._sh") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("b._id").as("id2"))
      .dropDuplicates("id1", "id2")
    cand
      .join(hs.select(col("_id").as("id1"), col("_hset").as("_h1"),
        col("_n").as("n1")), "id1")
      .join(hs.select(col("_id").as("id2"), col("_hset").as("_h2"),
        col("_n").as("n2")), "id2")
      .withColumn("inter", size(array_intersect(col("_h1"), col("_h2"))).cast("long"))
      .filter(col("inter") * 1000 >= lit(tMilli.toLong) * least(col("n1"), col("n2")))
      .select(col("id1"), col("id2"),
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        col("inter"),
        expr("inter * 1000 div n1").as("c1_milli"),
        expr("inter * 1000 div n2").as("c2_milli"))
  }

  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      orderByRarity: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // reused 4x (prefix index both join sides + exact verify both
    // sides); spill-not-recompute for corpus-scale shingle-hash
    // arrays. Lifecycle: releaseCaches()
    val hs = trackPersist(
      df.select(col(idCol).as("_id"), shingleHashes(col(textCol), n).as("_hset")))
    // Prefix selection needs only SOME global total order on shingles
    // for the pigeonhole to hold. Two orders offered:
    //  - hash order (default): prefix = slice of the sorted hash set —
    //    fully narrow, no global aggregate, ~2× the candidates;
    //  - rarity order: doc-frequency asc — fewest candidates, but pays
    //    a global frequency aggregate + join + per-doc window. Prefer
    //    it when verification (not candidate generation) dominates.
    val prefix =
      if (!orderByRarity) {
        val preLen = (col("_n") - ceil(lit(threshold) * col("_n")) + 1).cast("int")
        hs.withColumn("_n", size(col("_hset")))
          .select(col("_id"), col("_n"),
            explode(slice(array_sort(col("_hset")), lit(1), preLen)).as("_sh"))
      } else {
        val idx = hs.select(col("_id"), explode(col("_hset")).as("_sh"))
        val freq = idx.groupBy("_sh").agg(count(lit(1)).as("_f"))
        val wRank = Window.partitionBy("_id").orderBy(col("_f").asc, col("_sh").asc)
        val wAll = Window.partitionBy("_id")
        idx.join(freq, "_sh")
          .withColumn("_rn", row_number().over(wRank))
          .withColumn("_n", count(lit(1)).over(wAll))
          .filter(col("_rn") <= col("_n") - ceil(lit(threshold) * col("_n")) + 1)
          .select(col("_id"), col("_n"), col("_sh"))
      }
    // PPJoin length filter: J(a,b) >= t forces t·|b| <= |a| (and
    // symmetrically) — prune size-incompatible pairs at the prefix
    // join, before dedup + exact verification ever see them.
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a._sh") === col("b._sh") && col("a._id") < col("b._id") &&
        col("a._n") >= ceil(lit(threshold) * col("b._n")) &&
        col("b._n") >= ceil(lit(threshold) * col("a._n")))
      .select(col("a._id").as("id1"), col("b._id").as("id2"))
      .dropDuplicates("id1", "id2")
    cand
      .join(hs.select(col("_id").as("id1"), col("_hset").as("_h1")), "id1")
      .join(hs.select(col("_id").as("id2"), col("_hset").as("_h2")), "id2")
      .withColumn("_inter", size(array_intersect(col("_h1"), col("_h2"))))
      .withColumn("jaccard",
        col("_inter").cast("double") /
          (size(col("_h1")) + size(col("_h2")) - col("_inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ---- MinHash ----------------------------------------------------------

  /** Hash-permutation constants: `g_j(h) = (a_j*h + b_j) mod P` with
    * a_j odd. All intermediates < 2^36 — portable BIGINT arithmetic.
    */
  def mhA(j: Int): Long = 2L * j + 1
  def mhB(j: Int): Long = 97L * j + 13

  /** MinHash signature (array of `numHashes` minima) over the distinct
    * word n-gram shingles of a text. One narrow pass, no shuffle —
    * composed fused kernels: shingle hashes straight off the raw text
    * (no shingle strings materialized), then all `numHashes` minima in
    * one traversal. The declarative variant below re-expands the
    * shingle pipeline per hash function, numHashes× the work.
    */
  def minhashSignature(text: Column, n: Int = 3, numHashes: Int = 16): Column =
    graft.functions.NativeExpressions.minhashSigFromHashes(shingleHashes(text, n), numHashes)

  /** Declarative minhash — the SQL-portable specification, bit-equal
    * to [[minhashSignature]] (oracle-checked).
    */
  def minhashSignatureDeclarative(text: Column, n: Int = 3, numHashes: Int = 16): Column = {
    val hs = transform(shingles(text, n), s => polyHash(s))
    array((0 until numHashes).map { j =>
      array_min(transform(hs, h => (lit(mhA(j)) * h + lit(mhB(j))) % lit(P)))
    }: _*)
  }

  /** LSH band bucket: fold `rowsPerBand` consecutive signature slots
    * into one bucket hash (`bh = (bh*131 + sig_j) mod P`).
    */
  def bandHash(sig: Column, band: Int, rowsPerBand: Int): Column =
    (0 until rowsPerBand).foldLeft(lit(0L)) { (acc, r) =>
      (acc * lit(131L) + element_at(sig, band * rowsPerBand + r + 1)) % lit(P)
    }

  /** (id, sig, band, bh) band-bucket rows from a projected
    * (id, signature) frame — the ONE candidate-generation layout
    * shared by the batch self-join ([[minhashLshPairs]]), batch
    * cross-corpus dedup ([[crossCorpusDedup]]), and the streaming
    * dup-alert path ([[graft.streaming.StreamingState.crossCorpusDupStream]]),
    * so band hashing can never drift between them. Shingle-less docs
    * (null signature) are dropped — they can't match anything.
    */
  def bandBucketsFromSigs(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rpb = numHashes / bands
    sigs
      .filter(col(sigCol).getItem(0).isNotNull)
      .select(col(idCol), col(sigCol),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), bandHash(col(sigCol), b, rpb).as("bh"))): _*)).as("_b"))
      .select(col(idCol), col(sigCol), col("_b.band").as("band"), col("_b.bh").as("bh"))
  }

  /** Estimated Jaccard = fraction of agreeing signature slots. */
  def sigAgreement(s1: Column, s2: Column, numHashes: Int): Column =
    size(filter(zip_with(s1, s2, (x, y) => x === y), b => b))
      .cast("double") / lit(numHashes.toDouble)

  /** MinHash+LSH near-dup pairs: shingle→minhash→band→bucket-join.
    * Candidates are pairs agreeing on at least one band bucket; each
    * candidate is then verified with its exact signature agreement
    * ratio (estimated Jaccard) and kept if >= `threshold`.
    *
    * At scale: the bucket join is an equi-join on (band, bucket) — the
    * only shuffle moves (id, 16-long signature) tuples, never text.
    */
  /** Distinct-signature factoring for the MinHash family — same
    * argument as [[simhashFactored]]: band bucketing, candidate
    * generation, and signature verification depend only on signature
    * VALUES, so they run over the distinct-signature set (template-
    * heavy corpora put thousands of docs on one signature; the
    * doc-level self-join was quadratic in that occupancy). Returns
    * (members = (_id, _sig) persisted, valPairs = verified distinct
    * signature pairs (_s1, _s2, est_jaccard), sig1 < sig2
    * lexicographically).
    */
  /** Largest identical-sketch group size — the runtime signal behind
    * the ADAPTIVE candidate-join choice in [[minhashLshPairs]] /
    * [[simhashPairs]]. Factoring through DISTINCT sketch values is
    * load-bearing exactly when identical-sketch groups are hot (a
    * group of g docs forces g² candidate rows through ONE bucket task
    * — the measured 92×-at-10×-data quadratic), but on a corpus whose
    * sketches are ~all unique (a web crawl AFTER exact dedup — the
    * common pipeline order) the distinct set IS the member set, and
    * the factoring's extra aggregate plus two corpus-scale expansion
    * shuffles are pure overhead (~2× at sf0.1, measured). Max
    * occupancy, not a uniqueness RATIO, is the decision variable: one
    * 100k-doc template group hiding in a billion otherwise-unique
    * docs keeps any ratio ≈ 1 while making the direct join
    * catastrophic. Cost: one partial-agg'd metadata exchange (the
    * sketch column only, map-side combined to ~distinct cardinality)
    * over the already-persisted members frame — it doubles as the
    * cache materializer the downstream joins reuse, and it is always
    * cheaper than the two expansion shuffles it can save.
    */
  private def sketchMaxOccupancy(members: DataFrame, sigCol: String): Long = {
    val r = members.groupBy(col(sigCol)).count()
      .agg(max(col("count")).as("m")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Occupancy cap under which the doc-level candidate join is chosen
    * over distinct-value factoring: 256²/2 ≈ 33k candidate rows for
    * the hottest group — trivially task-local — while template-heavy
    * corpora (thousands of docs per sketch) stay on the factored
    * plan.
    */
  private val directPathMaxOccupancy = 256L

  private def minhashMembers(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int): DataFrame =
    trackPersist(df
      .select(col(idCol).as("_id"), minhashSignature(col(textCol), n, numHashes).as("_sig"))
      .filter(col("_sig").getItem(0).isNotNull)) // shingle-less docs can't match; reused by expansion joins

  private def minhashFactored(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double): (DataFrame, DataFrame) = {
    val members = minhashMembers(df, idCol, textCol, n, numHashes)
    (members, minhashValPairs(members, numHashes, bands, threshold))
  }

  private def minhashValPairs(
      members: DataFrame,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    val vals = members.select(col("_sig")).distinct()
    val buckets = bandBucketsFromSigs(vals.withColumn("_v", col("_sig")), "_v", "_sig",
      numHashes, bands).select(col("_sig"), col("band"), col("bh"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a._sig") < col("b._sig"))
      .select(col("a._sig").as("_s1"), col("b._sig").as("_s2"))
      .dropDuplicates("_s1", "_s2")
      .withColumn("est_jaccard", sigAgreement(col("_s1"), col("_s2"), numHashes))
      .filter(col("est_jaccard") >= lit(threshold))
  }

  /** `adaptive = true` (default) picks the candidate-join layout at
    * runtime from [[sketchMaxOccupancy]]: bounded identical-sketch
    * groups → ONE doc-level band self-join (no distinct aggregate, no
    * expansion joins, no pair-level exchange — see the
    * earliest-agreeing-band dedup below); hot identical-sketch groups
    * → the distinct-value factoring (quadratic-occupancy safe). Both
    * branches emit the identical (id1, id2, est_jaccard) set — the
    * oracle can't tell them apart; only the plan differs.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      adaptive: Boolean = true): DataFrame =
    minhashLshPairsFromMembers(
      minhashMembers(df, idCol, textCol, n, numHashes),
      numHashes, bands, threshold, adaptive)

  /** [[minhashLshPairs]] from an already-built (persisted) members
    * frame — lets callers that also need the raw shingle-hash arrays
    * (lshCalibrationReport's exact-verify rejoin) derive signatures
    * from ONE shared shingle pass instead of re-shingling the corpus.
    */
  private[pipeline] def minhashLshPairsFromMembers(
      members: DataFrame,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      adaptive: Boolean = true): DataFrame = {
    if (adaptive && sketchMaxOccupancy(members, "_sig") <= directPathMaxOccupancy) {
      // direct path: band-bucket self-join on doc rows. Identical-sig
      // pairs need no separate handling — they agree on every band
      // (est exactly 1.0) and surface from the same join. A pair
      // agreeing on SEVERAL bands is emitted only from its EARLIEST
      // one (a codegen'd filter re-deriving the earlier band hashes
      // from the signatures already on the row) — exactness without a
      // pair-level dropDuplicates exchange.
      val rpb = numHashes / bands
      val buckets = bandBucketsFromSigs(members, "_id", "_sig", numHashes, bands)
      val earliest = (0 until bands).map { b =>
        (col("a.band") === lit(b)) && (0 until b)
          .map(p => bandHash(col("a._sig"), p, rpb) =!= bandHash(col("b._sig"), p, rpb))
          .foldLeft(lit(true))(_ && _)
      }.reduce(_ || _)
      buckets.as("a")
        .join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a._id") < col("b._id"))
        .filter(earliest)
        .select(col("a._id").as("id1"), col("b._id").as("id2"),
          sigAgreement(col("a._sig"), col("b._sig"), numHashes).as("est_jaccard"))
        .filter(col("est_jaccard") >= lit(threshold))
    } else {
      val valPairs = minhashValPairs(members, numHashes, bands, threshold)
      val cross = valPairs.as("p")
        .join(members.as("a"), col("a._sig") === col("p._s1"))
        .join(members.as("b"), col("b._sig") === col("p._s2"))
        .select(least(col("a._id"), col("b._id")).as("id1"),
          greatest(col("a._id"), col("b._id")).as("id2"), col("p.est_jaccard"))
      // identical signatures agree on every slot: est is exactly 1.0,
      // which clears any threshold <= 1
      val within = saltedWithinPairs(members, "_sig")
        .withColumn("est_jaccard", lit(1.0))
      cross.unionAll(within)
    }
  }

  /** Component-equivalent linear edge set for the MinHash near-dup
    * graph — [[simhashEdges]]' twin: identical-signature star + one
    * representative edge per verified signature pair. Feed to
    * [[connectedComponents]] / [[nearDupDedup]] in place of
    * [[minhashLshPairs]] when only dedup GROUPS are needed.
    */
  def minhashEdges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val (members, valPairs) = minhashFactored(df, idCol, textCol, n, numHashes, bands, threshold)
    val reps = members.groupBy("_sig").agg(min(col("_id")).as("_rep"))
    val star = members.join(reps, "_sig")
      .filter(col("_id") =!= col("_rep"))
      .select(col("_rep").as("id1"), col("_id").as("id2"))
    val crossReps = valPairs.as("p")
      .join(reps.select(col("_sig").as("_s1"), col("_rep").as("_r1")), "_s1")
      .join(reps.select(col("_sig").as("_s2"), col("_rep").as("_r2")), "_s2")
      .select(least(col("_r1"), col("_r2")).as("id1"),
        greatest(col("_r1"), col("_r2")).as("id2"))
    star.unionAll(crossReps)
  }

  /** Inter-source near-duplicate overlap matrix: for every unordered
    * pair of `sourceCol` values, the number of verified MinHash
    * near-dup doc pairs crossing them plus their estimated-Jaccard
    * mass — the curation report that quantifies duplication BETWEEN
    * ingest sources (crawl snapshot vs curated set, vendor A vs B)
    * before choosing mixture weights. Consumes [[minhashLshPairs]];
    * the extra cost is two (id → source) metadata joins and one tiny
    * source-pair aggregation — the doc-pair set never widens, and
    * map-side partials reduce it to at most |sources|² rows.
    * `sum_est` stays exact cross-engine: every estimate is a multiple
    * of 1/numHashes (a dyadic rational for the default 16), so double
    * summation is order-independent.
    */
  def sourceOverlapMatrix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, numHashes, bands, threshold)
    val src = df.select(col(idCol), col(sourceCol))
    pairs
      .join(src.toDF("id1", "_src1"), "id1")
      .join(src.toDF("id2", "_src2"), "id2")
      .groupBy(least(col("_src1"), col("_src2")).as("source_a"),
        greatest(col("_src1"), col("_src2")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("est_jaccard")).as("sum_est"))
  }

  /** Cross-corpus dedup: rows of `dfNew` that near-duplicate any row
    * of `dfRef` (MinHash est-Jaccard >= `threshold`) are dropped; the
    * survivors of `dfNew` return unchanged. The incremental-ingest
    * complement to [[minhashLshPairs]]' self-join: ref shards already
    * deduped, a new crawl deduped AGAINST them without re-pairing ref
    * with itself.
    *
    * Scale shape: both sides project to (id, signature) and meet in a
    * band-bucket equi-join — ref text never re-shuffles, candidates
    * are bucket-colocated pairs only, then one anti-join on the
    * dropped-id set.
    */
  def crossCorpusDedup(
      dfNew: DataFrame,
      dfRef: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    // factored through DISTINCT signatures on BOTH sides (the
    // simhashFactored argument): whether a new doc is dropped depends
    // only on its signature VALUE, so the band join runs over distinct
    // values — a hot identical-signature group on each side would
    // otherwise multiply (|ref group| × |new group| candidate rows) —
    // and the dropped SET needs no pair expansion at all: one
    // semi-join of new docs against the matched-signature values
    val newSigs = docSigs(dfNew, idCol, textCol, n, numHashes)
    dropAgainstRefBuckets(dfNew, newSigs,
      distinctSigBuckets(docSigs(dfRef, idCol, textCol, n, numHashes), numHashes, bands),
      idCol, numHashes, bands, threshold)
  }

  private def docSigs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("_id"), minhashSignature(col(textCol), n, numHashes).as("_sig"))

  /** Banded buckets over DISTINCT signature values: (_sig, band, bh). */
  private def distinctSigBuckets(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame =
    bandBucketsFromSigs(
      sigs.select(col("_sig")).distinct().withColumn("_v", col("_sig")),
      "_v", "_sig", numHashes, bands).select(col("_sig"), col("band"), col("bh"))

  /** Shared [[crossCorpusDedup]] tail: new-side distinct-signature
    * buckets banded against the (in-session or loaded) reference
    * buckets, matches verified on exact signature agreement, dropped
    * ids recovered by one semi-join.
    */
  private def dropAgainstRefBuckets(
      dfNew: DataFrame,
      newSigs: DataFrame,
      refBuckets: DataFrame,
      idCol: String,
      numHashes: Int,
      bands: Int,
      threshold: Double): DataFrame = {
    val droppedVals = refBuckets.as("a")
      .join(distinctSigBuckets(newSigs, numHashes, bands).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a._sig").as("_s1"), col("b._sig").as("_s2"))
      .dropDuplicates("_s1", "_s2")
      .withColumn("_est", sigAgreement(col("_s1"), col("_s2"), numHashes))
      .filter(col("_est") >= lit(threshold))
      .select(col("_s2").as("_sig")).distinct()
    val droppedIds = newSigs.join(droppedVals, Seq("_sig"), "left_semi")
      .select(col("_id").as(idCol))
    dfNew.join(droppedIds, Seq(idCol), "left_anti")
  }

  /** Persisted dedup reference index: the banded DISTINCT-signature
    * buckets of a reference corpus, written once, partitioned by band
    * — the [[graft.pipeline.Similarity.saveIndex]] lifecycle applied
    * to dedup. At 100 TB the historical corpus is shingled ONCE;
    * daily increments then dedup against the saved buckets without
    * touching historical text (the index build's exchange carries
    * only distinct signatures, and serving reads bucket rows only).
    * Fit parameters ride along as metadata so a query cannot silently
    * bind mismatched shingle/hash/band settings.
    */
  def saveDedupIndex(
      dfRef: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): Unit = {
    val spark = dfRef.sparkSession
    import spark.implicits._
    distinctSigBuckets(docSigs(dfRef, idCol, textCol, n, numHashes), numHashes, bands)
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
    Seq((n, numHashes, bands)).toDF("n", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Doc-level variant of [[saveDedupIndex]] for PAIR consumers (the
    * d10s alert stream needs the matching reference doc's id, not
    * just its signature): writes `(ref_id, _rsig, band, bh)`
    * partitioned by band. Load with `spark.read.parquet(path)` (cast
    * `band` back to int) and serve via
    * [[graft.streaming.StreamingState.crossCorpusDupStreamAgainst]].
    */
  def saveDedupPairIndex(
      dfRef: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): Unit =
    bandBucketsFromSigs(
      dfRef.select(col(idCol).as("ref_id"),
        minhashSignature(col(textCol), n, numHashes).as("_rsig")),
      "ref_id", "_rsig", numHashes, bands)
      .write.mode("overwrite").partitionBy("band").parquet(path)

  /** Incremental maintenance for [[saveDedupIndex]]: shingle/band ONLY
    * the delta shard and append its bucket rows into the existing band
    * partitions — the daily-ingest path (s13's pattern for the dedup
    * index). The index's drop semantics ("new doc matches ANY
    * reference signature") are union semantics, so a signature both
    * shards contain appearing twice changes nothing — appends never
    * need to read, dedupe against, or rewrite the existing corpus's
    * bands. Fit parameters come FROM the stored metadata, so a delta
    * cannot silently bind mismatched shingle/hash/band settings.
    */
  def appendToDedupIndex(
      dfDelta: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val idx = loadDedupIndex(dfDelta.sparkSession, path)
    distinctSigBuckets(
      docSigs(dfDelta, idCol, textCol, idx.n, idx.numHashes),
      idx.numHashes, idx.bands)
      .write.mode("append").partitionBy("band").parquet(s"$path/bands")
  }

  /** Loaded [[saveDedupIndex]] surface: lazy bucket frame + fit
    * parameters. */
  final case class DedupIndex(buckets: DataFrame, n: Int, numHashes: Int, bands: Int)

  def loadDedupIndex(spark: org.apache.spark.sql.SparkSession, path: String): DedupIndex = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    DedupIndex(
      // partition discovery infers int for the partition column
      spark.read.parquet(s"$path/bands").withColumn("band", col("band").cast("int")),
      meta.getAs[Int]("n"), meta.getAs[Int]("num_hashes"), meta.getAs[Int]("bands"))
  }

  /** [[crossCorpusDedup]] served from a persisted reference index:
    * identical semantics and tie rules — the d15 gate pins it equal
    * to the in-session run over the same reference corpus.
    */
  def crossCorpusDedupWithIndex(
      dfNew: DataFrame,
      index: DedupIndex,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val newSigs = docSigs(dfNew, idCol, textCol, index.n, index.numHashes)
    dropAgainstRefBuckets(dfNew, newSigs,
      index.buckets.select(col("_sig"), col("band"), col("bh")),
      idCol, index.numHashes, index.bands, threshold)
  }

  // ---- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over whitespace tokens (with multiplicity): bit b
    * is set iff more token hashes have bit b set than clear. One
    * narrow pass fused over the raw text (rolling per-token hash, no
    * token array materialized; the declarative variant re-scans the
    * hash array per bit).
    */
  def simhash(text: Column, bits: Int = 32): Column =
    graft.functions.NativeExpressions.simhashText(text, bits)

  /** Declarative simhash — the SQL-portable specification, bit-equal
    * to [[simhash]] (oracle-checked); literal masks only, no variable
    * shifts, so it runs on any SQL engine.
    */
  def simhashDeclarative(text: Column, bits: Int = 32): Column = {
    val hs = transform(tokens(text), t => polyHash(t))
    val n = size(hs)
    (0 until bits)
      .map { b =>
        // independent per-bit re-hash (see SimHash scaladoc)
        val ones = size(filter(hs, h =>
          ((h * lit(2L * b + 3)) % lit(P)).bitwiseAND(lit(1L)) === lit(1L)))
        when(ones * lit(2) > n, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** The simhash near-dup machinery FACTORED THROUGH DISTINCT SKETCH
    * VALUES: the "hamming(sh_a, sh_b) <= k" relation depends only on
    * the sketch values, so docs sharing a sketch are interchangeable —
    * candidate generation, verification, and blocking all run over the
    * (far smaller) distinct-value set, and documents only reappear at
    * the very end. Load-bearing at scale: template-heavy corpora put
    * tens of thousands of docs on ONE sketch (sf1 smoke: two 13k-doc
    * identical-sketch groups), and the unfactored doc-level block join
    * was quadratic in that occupancy (measured 92× at 10× data).
    *
    * Returns (members = (_id, _sh) persisted, valPairs = verified
    * DISTINCT-value pairs (_sh1, _sh2, hamming>=1)).
    */
  private def simhashFactored(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      bits: Int,
      blockBits: Int): (DataFrame, DataFrame) = {
    val members = trackPersist(
      df.select(col(idCol).as("_id"), simhash(col(textCol), bits).as("_sh"))) // reused by expansion joins
    (members, simhashValPairs(members, maxHamming, bits, blockBits))
  }

  /** Pigeonhole block exploder shared by the factored (distinct-value)
    * and direct (doc-level) candidate joins — `keep` columns ride
    * along with the (blk, bv) struct.
    */
  private def simhashBlocks(
      rows: DataFrame, keep: Seq[String], bits: Int, blockBits: Int): DataFrame = {
    val nBlocks = bits / blockBits
    val blockMask = (1L << blockBits) - 1
    rows.select(keep.map(col) :+
      explode(array((0 until nBlocks).map(k =>
        struct(lit(k).as("blk"),
          col("_sh").bitwiseAND(lit(blockMask << (blockBits * k))).as("bv"))): _*))
        .as("_b"): _*)
  }

  private def simhashValPairs(
      members: DataFrame,
      maxHamming: Int,
      bits: Int,
      blockBits: Int): DataFrame = {
    require(maxHamming < bits / blockBits, "pigeonhole needs maxHamming < number of blocks")
    val blocks = simhashBlocks(members.select(col("_sh")).distinct(), Seq("_sh"), bits, blockBits)
    blocks.as("a")
      .join(blocks.as("b"),
        col("a._b.blk") === col("b._b.blk") && col("a._b.bv") === col("b._b.bv") &&
          col("a._sh") < col("b._sh"))
      .select(col("a._sh").as("_sh1"), col("b._sh").as("_sh2"))
      .dropDuplicates("_sh1", "_sh2")
      .withColumn("hamming", bit_count(col("_sh1").bitwiseXOR(col("_sh2"))))
      .filter(col("hamming") <= lit(maxHamming))
  }

  /** All intra-group pairs (id1 < id2) of `members` grouped by
    * `keyCol`, enumerated with SALTED parallelism: a group of size g
    * yields C(g,2) rows regardless (that's the output), but the rows
    * are produced across `salts`² reducer keys instead of one task
    * per group — the expansion of a 13k-doc identical-sketch group is
    * 92M rows, and without salting one executor thread emits all of
    * them. The a-side replicates `salts`× (members are (id, sketch)
    * tuples — metadata, not text), each copy owning the b-salt it
    * pairs with, so every pair appears exactly once.
    */
  private def saltedWithinPairs(
      members: DataFrame, keyCol: String, salts: Int = 16): DataFrame = {
    val a = members
      .withColumn("_sj", explode(array((0 until salts).map(j => lit(j.toLong)): _*)))
    val b = members.withColumn("_sb", pmod(xxhash64(col("_id")), lit(salts.toLong)))
    a.as("a").join(b.as("b"),
      col(s"a.$keyCol") === col(s"b.$keyCol") && col("a._sj") === col("b._sb") &&
        col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("b._id").as("id2"))
  }

  /** SimHash near-dup pairs with Hamming distance <= `maxHamming`,
    * candidates blocked on agreeing 16-bit sub-blocks of a 48-bit
    * sketch (pigeonhole: a pair within Hamming `blocks-1` must agree
    * on at least one block, as in HmSearch) — with candidate
    * generation and verification factored through distinct sketch
    * values ([[simhashFactored]]): compute is ~linear in documents,
    * and docs re-enter only in the final expansion joins. The OUTPUT
    * is still inherently quadratic when huge identical-sketch groups
    * exist (every pair is a true pair) — pipelines that only need
    * dedup GROUPS should consume [[simhashEdges]] instead, which is
    * linear end-to-end.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 2,
      bits: Int = 48,
      blockBits: Int = 16,
      adaptive: Boolean = true): DataFrame = {
    val (members, valPairs) = simhashFactored(df, idCol, textCol, maxHamming, bits, blockBits)
    if (adaptive && sketchMaxOccupancy(members, "_sh") <= directPathMaxOccupancy) {
      // direct path (see minhashLshPairs): doc-level block self-join;
      // identical-sketch pairs agree on every block and fall out of
      // the same join with hamming 0. Multi-block agreements emit
      // only from the EARLIEST agreeing block (earlier block values
      // re-derived from the sketches on the row — a codegen'd filter,
      // not a pair-level dropDuplicates exchange).
      require(maxHamming < bits / blockBits, "pigeonhole needs maxHamming < number of blocks")
      val nBlocks = bits / blockBits
      val blockMask = (1L << blockBits) - 1
      val blocks = simhashBlocks(members, Seq("_id", "_sh"), bits, blockBits)
      val earliest = (0 until nBlocks).map { k =>
        (col("a._b.blk") === lit(k)) && (0 until k)
          .map { p =>
            val m = lit(blockMask << (blockBits * p))
            col("a._sh").bitwiseAND(m) =!= col("b._sh").bitwiseAND(m)
          }
          .foldLeft(lit(true))(_ && _)
      }.reduce(_ || _)
      blocks.as("a")
        .join(blocks.as("b"),
          col("a._b.blk") === col("b._b.blk") && col("a._b.bv") === col("b._b.bv") &&
            col("a._id") < col("b._id"))
        .filter(earliest)
        .select(col("a._id").as("id1"), col("b._id").as("id2"),
          bit_count(col("a._sh").bitwiseXOR(col("b._sh"))).as("hamming"))
        .filter(col("hamming") <= lit(maxHamming))
    } else {
      val cross = valPairs.as("p")
        .join(members.as("a"), col("a._sh") === col("p._sh1"))
        .join(members.as("b"), col("b._sh") === col("p._sh2"))
        .select(least(col("a._id"), col("b._id")).as("id1"),
          greatest(col("a._id"), col("b._id")).as("id2"), col("p.hamming"))
      val within = saltedWithinPairs(members, "_sh")
        .withColumn("hamming", lit(0).cast("int"))
      cross.unionAll(within)
    }
  }

  /** Component-equivalent EDGE set for the simhash near-dup graph,
    * LINEAR in documents: a star over each identical-sketch group
    * (min-id representative — a bucket clique and its star have the
    * same connected components) plus ONE representative edge per
    * verified distinct-sketch pair. Feed to [[connectedComponents]] /
    * [[nearDupDedup]] in place of [[simhashPairs]]: identical
    * components, never a quadratic clique materialized. This is the
    * 100 TB shape — the sf1 smoke put two 13k-doc groups in the
    * corpus, where pair enumeration is 2×10^8 rows and this is 27k.
    */
  def simhashEdges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 2,
      bits: Int = 48,
      blockBits: Int = 16): DataFrame = {
    val (members, valPairs) = simhashFactored(df, idCol, textCol, maxHamming, bits, blockBits)
    val reps = members.groupBy("_sh").agg(min(col("_id")).as("_rep"))
    val star = members.join(reps, "_sh")
      .filter(col("_id") =!= col("_rep"))
      .select(col("_rep").as("id1"), col("_id").as("id2"))
    val crossReps = valPairs.as("p")
      .join(reps.select(col("_sh").as("_sh1"), col("_rep").as("_r1")), "_sh1")
      .join(reps.select(col("_sh").as("_sh2"), col("_rep").as("_r2")), "_sh2")
      .select(least(col("_r1"), col("_r2")).as("id1"),
        greatest(col("_r1"), col("_r2")).as("id2"))
    star.unionAll(crossReps)
  }

  /** Near-dup PAIR REPORT for the simhash relation, metadata-sized:
    * per Hamming distance, the number of true pairs and the number of
    * documents involved — computed ANALYTICALLY from signature-group
    * occupancies (identical-sketch groups contribute C(g,2) pairs at
    * hamming 0; a verified distinct-sketch pair (s1,s2) contributes
    * g1·g2), never by enumerating pairs. This is what a 100 TB dedup
    * audit actually wants from [[simhashPairs]]: the sf1 smoke's 93×
    * entry was OUTPUT-bound (370M materialized pairs); this report
    * carries ≤ maxHamming+1 rows no matter how duplicated the corpus
    * is. Oracle: enumerate-then-aggregate over the same relation.
    */
  def simhashPairStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 2,
      bits: Int = 48,
      blockBits: Int = 16): DataFrame = {
    val (members, valPairs) = simhashFactored(df, idCol, textCol, maxHamming, bits, blockBits)
    pairStatsFromGroups(members, "_sh",
      valPairs.select(col("_sh1").as("_k1"), col("_sh2").as("_k2"),
        col("hamming").cast("long").as("_rel")))
  }

  /** [[simhashPairStats]] for the MinHash-LSH relation: report rows
    * keyed by estimated Jaccard (identical signatures = 1.0). */
  def minhashPairStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val (members, valPairs) = minhashFactored(df, idCol, textCol, n, numHashes, bands, threshold)
    pairStatsFromGroups(members, "_sig",
      valPairs.select(col("_s1").as("_k1"), col("_s2").as("_k2"),
        col("est_jaccard").as("_rel")))
      .withColumnRenamed("hamming", "est_jaccard")
  }

  /** LSH calibration report: how well does the MinHash signature
    * agreement ESTIMATE track the exact Jaccard it approximates, on
    * this corpus? A deterministic 1-in-`sampleMod` sample of the
    * verified pair set joins back to the documents' distinct
    * shingle-hash sets and reports, per estimate value, integer
    * intersection/union mass (exact — no float accumulation). This
    * is the audit that decides whether `threshold` is calibrated
    * before a 100 TB dedup run commits to it; cost is bounded by the
    * SAMPLE (only sampled pairs rejoin text-derived sets — the corpus
    * itself contributes one shingle-hash scan).
    */
  def lshCalibrationReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      sampleMod: Int = 7): DataFrame = {
    require(sampleMod >= 1, "sampleMod must be >= 1")
    // NOT shared through a persisted (id, shingle-hashes) frame (r16
    // A/B): deriving the signatures and both rejoin sides from one
    // cached hash-array frame was a measured wash at sf0.1 (d3d
    // 1.63 s no-share vs 1.64/1.96 s shared; d3c 0.82 both) — the
    // columnar encode/decode of corpus-scale long arrays costs what
    // the saved fused shingle kernels earn, the same lesson as the
    // r15 signature-path fan-out rejections. The real d3d cost was
    // downstream re-evaluation, fixed in lshThresholdPick (lv
    // persist).
    val pairs = minhashLshPairs(df, idCol, textCol, n, numHashes, bands, threshold)
      .filter((col("id1") * lit(1000003L) + col("id2")) % lit(sampleMod.toLong) === 0)
    val sets = df.select(col(idCol).as("_sid"), shingleHashes(col(textCol), n).as("_hs"))
    pairs
      .join(sets.select(col("_sid").as("id1"), col("_hs").as("_h1")), "id1")
      .join(sets.select(col("_sid").as("id2"), col("_hs").as("_h2")), "id2")
      .select(col("est_jaccard"),
        size(array_intersect(col("_h1"), col("_h2"))).cast("long").as("_i"),
        (size(col("_h1")) + size(col("_h2"))
          - size(array_intersect(col("_h1"), col("_h2")))).cast("long").as("_u"))
      .groupBy("est_jaccard")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_i")).as("sum_inter"),
        sum(col("_u")).as("sum_union"))
  }

  /** Band/row tuning table from a calibration frame (round-9 task 9):
    * the one-step consumer of [[lshCalibrationReport]] that picks the
    * MinHash-LSH band configuration for a target precision — the
    * Datasketches-style "tuning" table, computed ENTIRELY in integer
    * arithmetic so the decision is bit-reproducible across engines.
    *
    * Semantics: a level is an estimated-Jaccard value `k/numHashes`
    * from the calibration frame. The CUTOFF is the smallest level
    * whose suffix mass (all sampled pairs estimated at or above it)
    * clears the target exact-Jaccard ratio `targetNum/targetDen` by
    * integer cross-multiplication (`sum_inter·D >= sum_union·N` —
    * mass-weighted, no float accumulation). Each candidate (bands,
    * rows) divisor pair of `numHashes` has S-curve midpoint
    * `t = (1/bands)^(1/rows)`; the chosen config is the one with the
    * LARGEST midpoint not above the cutoff (collides everything at or
    * above the calibrated level with high probability while admitting
    * the least sub-threshold mass), falling back to the smallest
    * midpoint when every candidate sits above the cutoff. Midpoint
    * comparisons avoid libm: `t1 < t2  ⇔  b1^r2 > b2^r1` and
    * `t <= k/H  ⇔  H^r <= k^r·b` — small integer powers, exact in
    * IEEE doubles (< 2^53), no `ln`/`pow` rounding in any gated
    * value (the p9 no-libm pattern).
    *
    * 100 TB shape: the calibration frame is metadata-sized (at most
    * numHashes+1 rows), so every join here is a few-row cross/range
    * join on the driver-adjacent tail of the audit — cost lives in
    * [[lshCalibrationReport]]'s sampled rejoin, not here.
    */
  def lshThresholdPick(
      calib: DataFrame,
      numHashes: Int = 16,
      targetNum: Long = 4,
      targetDen: Long = 5): DataFrame = {
    require(numHashes >= 4, "need numHashes >= 4 for a non-trivial band grid")
    require(targetNum >= 0 && targetDen > 0, "target must be a valid ratio")
    val spark = calib.sparkSession
    val H = numHashes.toLong
    // r16 optimization (§5 caching — reused and expensive to
    // recompute): this tuner references the calibration frame through
    // a suffix-mass self-join plus two crossJoin tails, so an
    // UNPERSISTED calib re-ran the whole corpus-scale sampled rejoin
    // 4-5× per query (measured: d3d 2.3 s vs d3c 0.8 s for the same
    // calibration). The frame is at most numHashes+1 rows — persist
    // the metadata, never the corpus.
    val lv = trackPersist(calib.select(
      (col("est_jaccard") * H).cast("long").as("k"),
      col("n_pairs"), col("sum_inter"), col("sum_union")))
    // suffix mass per level (range self-join on a <= H+1-row frame)
    val agg = lv.as("a").join(lv.as("b"), col("b.k") >= col("a.k"))
      .groupBy(col("a.k").as("k"))
      .agg(sum(col("b.sum_inter")).as("i_mass"), sum(col("b.sum_union")).as("u_mass"))
    val cut = agg
      .filter(col("i_mass") * targetDen >= col("u_mass") * targetNum)
      .agg(coalesce(min(col("k")), lit(H + 1)).as("cutoff_k"))
    // candidate divisor pairs of numHashes, bands and rows both >= 2
    val cands = (2 to numHashes / 2)
      .filter(numHashes % _ == 0).map(b => (b, numHashes / b))
      .filter(_._2 >= 2)
    val cd = spark.createDataFrame(cands).toDF("bands", "rows_per_band")
    // rank by midpoint descending: x beaten by y  ⇔  t_x < t_y  ⇔  bx^ry > by^rx
    val ranked = cd.as("x").crossJoin(cd.as("y"))
      .groupBy(col("x.bands").as("bands"), col("x.rows_per_band").as("rows_per_band"))
      .agg(sum(when(
        pow(col("x.bands"), col("y.rows_per_band")).cast("long") >
          pow(col("y.bands"), col("x.rows_per_band")).cast("long"), 1L)
        .otherwise(0L)).as("rnk"))
    val n = cands.size.toLong
    // eligibility: midpoint <= cutoff  ⇔  H^r <= k^r · b
    val out = ranked.crossJoin(cut)
      .withColumn("mid_le_cutoff",
        pow(lit(H), col("rows_per_band")).cast("long") <=
          pow(col("cutoff_k"), col("rows_per_band")).cast("long") * col("bands"))
    val anyEligible = out.agg(
      coalesce(max(when(col("mid_le_cutoff"), 1L).otherwise(0L)), lit(0L)).as("_any"))
    out.crossJoin(anyEligible)
      .withColumn("chosen",
        when(col("_any") === 1L,
          col("mid_le_cutoff") &&
            col("rnk") === min(when(col("mid_le_cutoff"), col("rnk")))
              .over(org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .otherwise(col("rnk") === (n - 1)))
      .drop("_any")
  }

  /** Shared analytic pair-count aggregation: `members` = (_id, key),
    * `relPairs` = verified DISTINCT-key pairs (_k1, _k2, _rel). The
    * within-group relation value is 0 for hamming-keyed relations and
    * must be rebadged by the caller for similarity-keyed ones (minhash
    * identical sigs estimate 1.0 — handled via [[withinRel]]).
    */
  private def pairStatsFromGroups(
      members: DataFrame, keyCol: String, relPairs: DataFrame): DataFrame = {
    val withinRel: Column =
      if (keyCol == "_sig") lit(1.0) else lit(0L) // identical keys: est 1.0 / hamming 0
    val sizes = members.groupBy(col(keyCol).as("_k")).agg(count(lit(1)).as("_g"))
    val within = sizes.filter(col("_g") >= 2)
      // g·(g−1) is even, so `div 2` is exact — and the whole pair count
      // accumulates in LONG (a `/ 2` here summed in DOUBLE, losing
      // integer exactness past 2^53 pairs and tripping the float-sum
      // lint; group counts are integers end to end)
      .agg(sum(expr("_g * (_g - 1) div 2")).as("n_pairs"),
        sum(col("_g")).as("n_docs"))
      .select(withinRel.as("hamming"),
        col("n_pairs").cast("long"), col("n_docs").cast("long"))
      .filter(col("n_pairs") > 0)
    val joined = relPairs
      .join(sizes.select(col("_k").as("_k1"), col("_g").as("_g1")), "_k1")
      .join(sizes.select(col("_k").as("_k2"), col("_g").as("_g2")), "_k2")
    val nPairs = joined.groupBy(col("_rel").as("hamming"))
      .agg(sum(col("_g1") * col("_g2")).cast("long").as("n_pairs"))
    // docs involved at a relation value: every doc of every key that
    // participates in a pair there (each doc carries ONE key)
    val nDocs = joined
      .select(col("_rel").as("hamming"),
        explode(array(col("_k1"), col("_k2"))).as("_k"))
      .distinct()
      .join(sizes, "_k")
      .groupBy("hamming").agg(sum(col("_g")).cast("long").as("n_docs"))
    within.unionAll(nPairs.join(nDocs, "hamming")
      .select(col("hamming"), col("n_pairs"), col("n_docs")))
  }

  /** Dedup savings sheet: per near-dup GROUP SIZE, how many groups,
    * docs, and the exact token mass a keep-one-representative pass
    * would drop — the "what does this dedup buy" read consumed before
    * committing a corpus-wide pass (pairs and components say who
    * duplicates whom; this says what it is worth). The kept
    * representative is the component label itself (the minimum id, by
    * the [[connectedComponents]] contract), so the saved mass per
    * group is `Σtokens − tokens(label)` — exact integers.
    *
    * Scale shape: one id-keyed join of the component frame to the
    * narrow token masses, one component-keyed partial-agg'd exchange,
    * then a ~|distinct size| histogram aggregation. Returns
    * (group_size, n_groups, n_docs, total_tokens, saved_tokens).
    */
  def dedupSavings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      components: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long").as("_nt"))
    components.join(toks, Seq("id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("_size"), sum(col("_nt")).as("_tok"),
        // the kept representative IS the label (min id)
        min(when(col("id") === col("component"), col("_nt"))).as("_kept"))
      .groupBy(col("_size").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("_size")).as("n_docs"),
        sum(col("_tok")).as("total_tokens"),
        sum(col("_tok") - col("_kept")).as("saved_tokens"))
  }

  // ---- Dedup group resolution -------------------------------------------

  /** Connected components over a near-dup pair graph: every document
    * that appears in a pair gets the minimum reachable id as its
    * `component` — the canonical keep/drop group id a dedup pipeline
    * consumes downstream of pair generation (keep = id == component).
    *
    * Star contraction with pointer doubling: each round every
    * (super)node adopts the minimum label in its closed neighborhood
    * (a component's global minimum can never be displaced, so it is
    * the survivor). Those pointers form a forest (every pointer goes
    * to a smaller id, so no cycles); the forest is flattened to its
    * roots by label-of-label composition to fixpoint — depth halves
    * per hop, so a chain of length D resolves in O(log D) hops, not D
    * rounds. The edge list is then CONTRACTED into root-label space
    * and shrinks geometrically. The driver runs only edge/change
    * count checks; lineage is truncated per hop (localCheckpoint +
    * [[org.apache.spark.sql.graft.DatasetBridge.freshLeaf]] — the
    * checkpoint alone preserves origin statistics since SPARK-39834,
    * and those BigInt size estimates compound across self-join rounds
    * until stats estimation itself hangs).
    *
    * Hybrid tail finish: once the surviving label-space edge set fits
    * under `localEdgeThreshold` (it shrinks geometrically, so this is
    * a few rounds in even at 100 TB), the remaining contraction is
    * finished with a driver-side union-find over that bounded edge
    * list — one collect + one broadcast remap join instead of ~8 jobs
    * per tail round. This is metadata-sized label data, not corpus
    * data; the early heavy rounds stay fully distributed. The local
    * finish needs an ordering on the id type — Long/Int/String/
    * Timestamp are handled; anything else falls back to distributed
    * rounds all the way down (measured: sf0.1 simhash graph d6
    * 5.1s → ~1.5s).
    */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      localEdgeThreshold: Long = 500000L): DataFrame = {
    // materialize AND drop propagated origin stats — see freshLeaf
    def ck(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.DatasetBridge.freshLeaf(df.localCheckpoint())
    // no id-type cast: min/least orderings work for any orderable id
    // type (a cast("long") would null string ids and silently drop
    // every edge)
    var e = ck(pairs
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    // comp: original node -> current component label
    var comp = ck(e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .distinct().withColumn("l", col("v")))
    var it = 0
    var nEdges = e.count()
    def localFinishable: Boolean =
      nEdges <= localEdgeThreshold && localOrdering(e.schema(0).dataType).isDefined
    while (nEdges > 0 && !localFinishable && it < maxIter) {
      // min over the closed neighborhood, in label space: a pointer
      // forest x -> lx with lx <= x (roots are local minima)
      val minN = e.union(e.select(col("b").as("a"), col("a").as("b")))
        .groupBy("a").agg(min(col("b")).as("m"))
        .select(col("a").as("x"), least(col("a"), col("m")).as("lx"))
      // pointer doubling: compose the map with itself until fixpoint —
      // pointer depth halves per hop, so chains flatten in O(log D)
      var lx = ck(minN)
      var hops = 0
      var changed = true
      while (changed && hops < 64) {
        val composed = ck(lx
          .join(lx.select(col("x").as("lx"), col("lx").as("_ll")), Seq("lx"), "left")
          .select(col("x"), col("lx").as("_prev"),
            coalesce(col("_ll"), col("lx")).as("_next")))
        changed = composed.filter(col("_next") =!= col("_prev")).count() > 0
        lx = composed.select(col("x"), col("_next").as("lx"))
        hops += 1
      }
      // comp is only consumed once at the end: compose the remap
      // lazily (plan grows LINEARLY over checkpointed lx frames — no
      // per-round materialization job needed)
      comp = comp
        .join(lx.withColumnRenamed("x", "l"), Seq("l"), "left")
        .select(col("v"), coalesce(col("lx"), col("l")).as("l"))
      // contract edges into root-label space; drop intra-supernode
      val la = lx.select(col("x").as("a"), col("lx").as("_la"))
      val lb = lx.select(col("x").as("b"), col("lx").as("_lb"))
      e = ck(e.join(la, Seq("a")).join(lb, Seq("b"))
        .select(col("_la").as("a"), col("_lb").as("b"))
        .filter(col("a") =!= col("b")).distinct())
      nEdges = e.count()
      it += 1
    }
    if (nEdges > 0 && localFinishable) {
      // bounded label-space tail: union-find with min-id roots — the
      // root of a merged set is min(roots), so every label resolves to
      // the minimum reachable id, exactly what the rounds converge to
      val ord = localOrdering(e.schema(0).dataType).get
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      e.collect().foreach { row =>
        val (ra, rb) = (find(row.get(0)), find(row.get(1)))
        if (ra != rb) {
          if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      import scala.jdk.CollectionConverters._
      val remapRows: java.util.List[org.apache.spark.sql.Row] =
        parent.keys.map(l => org.apache.spark.sql.Row(l, find(l))).toSeq.asJava
      val lType = e.schema(0).dataType
      val remap = pairs.sparkSession.createDataFrame(remapRows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("l", lType),
          org.apache.spark.sql.types.StructField("_root", lType))))
      comp = comp.join(broadcast(remap), Seq("l"), "left")
        .select(col("v"), coalesce(col("_root"), col("l")).as("l"))
    } else if (nEdges > 0)
      // a partially-contracted labeling is under-deduplication:
      // callers (nearDupDedup, d6/d7) would silently keep documents
      // that belong to a not-yet-merged component — fail loudly
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter rounds " +
          "(inter-component edges remain); raise maxIter — rounds are " +
          "O(log diameter), so this indicates a pathological graph or too-low cap")
    comp.select(col("v").as("id"), col("l").as("component"))
  }

  /** Driver-side ordering for the hybrid CC tail finish; None = id
    * type unsupported locally, stay distributed. MUST match Spark's
    * own `min()` total order: strings compare as UTF-8 BYTES
    * (UTF8String), not UTF-16 code units — java.lang.String.compareTo
    * diverges on supplementary characters; timestamps carry
    * sub-millisecond digits that `getTime` alone drops.
    */
  private def localOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
      case StringType => Some(new Ordering[Any] {
        def compare(a: Any, b: Any): Int = {
          val (x, y) = (a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8),
            b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8))
          java.util.Arrays.compareUnsigned(x, y)
        }
      })
      case TimestampType =>
        Some(Ordering.by { (x: Any) =>
          val t = x.asInstanceOf[java.sql.Timestamp]
          (t.getTime, t.getNanos)
        })
      case _ => None
    }
  }

  /** End-to-end near-duplicate dedup: given the corpus and a pair
    * graph from any candidate generator (jaccard/minhash/simhash/
    * embedding), keep exactly one canonical document per duplicate
    * group (the minimum id) and every document with no near-dup at
    * all. One anti-join against the non-canonical member set — the
    * shape every training-data pipeline ends with.
    */
  def nearDupDedup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs, "id1", "id2")
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** SOFT dedup (duplication-weighted sampling): instead of keeping
    * exactly one doc per near-dup group ([[nearDupDedup]]'s hard
    * drop), every doc survives with probability 1/|its dup group| —
    * the deterministic hash gate keeps each duplicated doc iff
    * `polyHash(id) % group_size == 0`, so a group of n contributes n
    * Bernoulli(1/n) survivors (≈1 in expectation) and singletons
    * always survive. This is the curation middle ground when hard
    * dedup is too aggressive (mild duplication correlates with
    * quality): expected copy count is flattened to ~1 without
    * discarding whole clusters deterministically. Returns the
    * surviving rows + their `dup_count`, so downstream mixture
    * weights can correct further. Cost = the d6 component machinery
    * plus one broadcast-size join of (id, group size).
    */
  def softDedupSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 2): DataFrame = {
    val comp = connectedComponents(
      simhashEdges(df, idCol, textCol, maxHamming), "id1", "id2")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("_n"))
    val withN = comp.join(sizes, "component")
      .select(col("id").as(idCol), col("_n"))
    df.join(withN, Seq(idCol), "left")
      .withColumn("dup_count", coalesce(col("_n"), lit(1L)))
      .filter(pmod(polyHash(col(idCol).cast("string")), col("dup_count")) === 0)
      .drop("_n")
  }

  /** [[nearDupDedup]] with a retention POLICY: per duplicate group the
    * survivor is the row maximizing `prefCol` (ties → lowest id), not
    * the minimum id — "keep the longest / highest-quality copy", the
    * rule real pipelines actually want (pair a quality score from
    * [[graft.pipeline.Curation.gopherSignals]] or
    * [[graft.functions.TextFunctions.qualityScore]] with any pair
    * generator). Same shape as [[nearDupDedup]]: components, one
    * per-component argmax aggregate, one anti-join. `prefCol` must be
    * numeric and non-null.
    */
  def nearDupDedupBy(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      prefCol: String): DataFrame = {
    val comp = connectedComponents(pairs, "id1", "id2")
    val members = comp.join(
      df.select(col(idCol).as("id"), col(prefCol).as("_pref")), "id")
    // rank within the component (pref desc, id asc): everything past
    // rank 1 is dropped — ONE exchange on the component and a single
    // pass over `members` (an agg+join-back would evaluate the members
    // subtree twice); dup groups are small, so the window sort is too
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col("_pref").desc, col("id").asc)
    val drop = members
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > 1)
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  // ---- Exact substring duplication (Lee et al. 2021) --------------------

  /** Positional word-`w`-gram hashes of a text — one hash per gram
    * START POSITION, duplicates preserved (unlike [[shingleHashes]],
    * which is a distinct set): the unit of measure for exact-substring
    * duplication is the gram occurrence, not the gram value. Texts
    * shorter than `w` tokens produce the empty array (guarded:
    * `sequence(1, k)` for k<1 generates a descending range).
    */
  def positionalGramHashes(text: Column, w: Int): Column =
    graft.functions.NativeExpressions.positionalGramHashes(text, w)

  /** Declarative specification of [[positionalGramHashes]] — the
    * per-position slice/concat/hash chain the fused kernel must match
    * bit-for-bit ([[graft.functions.PositionalGramHashes]]; parity
    * pinned in NativeExpressionsSpec). Interpreted lambda under a
    * higher-order function — keep it out of hot paths.
    */
  def positionalGramHashesDeclarative(text: Column, w: Int): Column = {
    val tk = tokens(text)
    when(size(tk) >= lit(w),
      transform(sequence(lit(1), size(tk) - lit(w - 1)),
        i => polyHash(concat_ws(" ", slice(tk, i, lit(w))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Exact-substring duplication stats per document (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" —
    * the ExactSubstr measurement, at word-`w`-gram granularity): for
    * every document with at least one `w`-gram, the number of gram
    * positions, the number of positions whose gram occurs at least
    * `minCount` times CORPUS-WIDE (including repeats inside the same
    * document — a doc that plagiarizes itself is duplicated text too),
    * and the duplicated fraction. Suffix-array span-merging is a
    * single-machine construction; the distributed equivalent is this
    * positional gram inverted index — same signal, linear shuffles.
    *
    * Scale shape: one narrow fused-hash projection (no gram strings
    * ever shuffle — 8-byte hashes do), one partial-aggregated count
    * per gram hash, one equi-join back on the hash (AQE splits the
    * hot-gram skew), one per-doc aggregation. Never all-pairs, and
    * nothing proportional to text size crosses the wire.
    */
  def substringDupStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 10,
      minCount: Long = 2): DataFrame = {
    val g = df
      // materialize the array BELOW the Generate: inlining the kernel
      // into explode() would evaluate it interpreted, once per element
      .select(col(idCol).as("_id"), positionalGramHashes(col(textCol), w).as("_gs"))
      .select(col("_id"), explode(col("_gs")).as("_gh"))
    val freq = g.groupBy("_gh").agg(count(lit(1)).as("_f"))
    g.join(freq, "_gh")
      .groupBy(col("_id").as(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_f") >= lit(minCount), 1L).otherwise(0L)).as("n_dup_pos"))
      .withColumn("dup_frac",
        col("n_dup_pos").cast("double") / col("n_grams").cast("double"))
  }

  /** ExactSubstr REMOVAL (Lee et al. 2021's actual transform — cut the
    * duplicated spans out, keep the rest of the document): every token
    * covered by any word-`w`-gram occurring at least `minCount` times
    * corpus-wide is dropped, and the surviving tokens are rejoined in
    * order. Documents with fewer than `w` tokens (no grams) pass
    * through unchanged. Returns (idCol, clean_text).
    *
    * Scale shape: gram hashes (8 bytes) carry the frequency join —
    * gram STRINGS never shuffle; the token-level reassembly shuffles
    * (id, pos, token) rows once, keyed by doc — linear in corpus
    * size, the same order of work as reading it. The per-doc
    * `sort_array(collect_list(struct(pos, tok)))` is bounded by
    * document length, not corpus size.
    */
  def substringDupRemove(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 10,
      minCount: Long = 2): DataFrame = {
    val g = df
      .select(col(idCol).as("_id"), positionalGramHashes(col(textCol), w).as("_gs"))
      .select(col("_id"), posexplode(col("_gs")).as(Seq("_pos", "_gh")))
    val freq = g.groupBy("_gh").agg(count(lit(1)).as("_f"))
    val covered = g.join(freq.filter(col("_f") >= lit(minCount)), "_gh")
      .select(col("_id"), explode(sequence(col("_pos"), col("_pos") + lit(w - 1))).as("_cp"))
      .distinct()
    val toks = df
      .select(col(idCol).as("_id"), posexplode(tokens(col(textCol))).as(Seq("_p", "_tk")))
    val rebuilt = toks
      .join(covered,
        toks("_id") === covered("_id") && col("_p") === col("_cp"), "left_anti")
      .groupBy(col("_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("_p"), col("_tk")))),
          x => x.getField("_tk"))).as("clean_text"))
      .select(col("_id").as(idCol), col("clean_text"))
    // fully-covered docs vanish from `rebuilt` — they keep an empty text
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Documents whose duplicated-substring fraction stays under
    * `maxDupFrac` — the keep-side filter a pipeline applies after
    * [[substringDupStats]]. Documents with fewer than `w` tokens have
    * no grams, hence nothing measurably duplicated: kept.
    */
  def substringDupFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 10,
      minCount: Long = 2,
      maxDupFrac: Double = 0.5): DataFrame = {
    val drop = substringDupStats(df, idCol, textCol, w, minCount)
      .filter(col("dup_frac") >= lit(maxDupFrac))
      .select(col(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  // ---- Embedding near-dup ----------------------------------------------

  /** Embedding-cosine near-dup pairs above `threshold`. `blocked=true`
    * routes candidates through sign-LSH buckets
    * ([[Similarity.signLshBucket]]) — the 100 TB path; `false` compares
    * all pairs (only for small/verification runs, and the shape the
    * oracle mirrors).
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      blocked: Boolean = false): DataFrame = {
    val v = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val pairs =
      if (!blocked)
        v.as("a").join(v.as("b"), col("a._id") < col("b._id"))
      else {
        val bk = v.withColumn("_bk", Similarity.signLshBucket(col("_v")))
        bk.as("a").join(bk.as("b"),
          col("a._bk") === col("b._bk") && col("a._id") < col("b._id"))
      }
    pairs
      .select(col("a._id").as("id1"), col("b._id").as("id2"),
        Similarity.cosine(col("a._v"), col("b._v")).as("cosine"))
      .filter(col("cosine") >= lit(threshold))
  }

  // ---- Winnowing (MOSS) fingerprint pairs ---------------------------------

  /** Enumeration-free winnowing audit: the fingerprint document-
    * frequency histogram with the PAIR-SLOT mass each df level would
    * contribute to [[winnowPairs]]' candidate join (`n_fps·C(df,2)`),
    * and the capped flag at `maxDf` — the d3b/d4b report pattern for
    * the case where enumerating pairs is output-quadratic (measured:
    * the sf1 replication corpus yields 103k true pairs; this report
    * stays at ~30 metadata rows). Read it to SET maxDf/minShared
    * before a 100 TB run: the capped rows' pair_slots is exactly the
    * join mass the cap removes.
    *
    * Scale shape: one fingerprint-keyed partial-agg'd exchange to df
    * counts, then a ~|distinct df| histogram aggregation. Never a
    * pair anywhere.
    */
  def winnowFpStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      maxDf: Int = 100): DataFrame = {
    require(maxDf >= 2, "winnowFpStats: maxDf >= 2 (1 admits no pair)")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"),
        explode(graft.functions.TextFunctions.fingerprint(col(textCol), k, w))
          .as("_fp"))
      // countDistinct, not count(*): robust to duplicated input ids
      // (fps are distinct per doc, but the id makes the df exact even
      // on re-fed rows — review finding)
      .groupBy(col("_fp")).agg(countDistinct(col("_id")).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_fps"))
      // pair-slot mass in DECIMAL(38,0), saturated at Long.MaxValue:
      // df*(df-1)/2 alone wraps a long at df ~ 4.3e9 — exactly the
      // boilerplate rows whose removed-mass number this report exists
      // to show (review finding). df*(df-1) is even, so /2 is exact.
      .withColumn("pair_slots",
        expr("CAST(least(CAST(n_fps AS DECIMAL(38,0)) * " +
          "(CAST(df AS DECIMAL(38,0)) * (df - 1) / 2), " +
          "9223372036854775807) AS BIGINT)"))
      .withColumn("capped", col("df") > maxDf)
  }

  /** Copied-passage candidate pairs from winnowing fingerprints
    * ([[graft.functions.TextFunctions.fingerprint]] — the fused
    * char-gram kernel tx4 gates): unordered doc pairs sharing at
    * least `minShared` distinct fingerprints, with both docs'
    * fingerprint counts and `overlap_milli = shared·1000 div
    * min(n_fp)`. By the winnowing guarantee (Schleimer et al.,
    * SIGMOD'03) a pair sharing a verbatim run of `>= k + w - 1`
    * characters is CERTAIN to share a fingerprint — a POSITIONAL
    * detector for copied passages, complementing Jaccard (d2),
    * MinHash (d3), and containment (d18), which measure SET overlap
    * and dilute as the host document grows.
    *
    * Scale shape: the fingerprinting is per-row codegen'd arithmetic
    * (text never shuffles); candidates come from an inverted
    * fingerprint index with a document-frequency cap (`maxDf`) — a
    * fingerprint in more docs than that is boilerplate whose inverted
    * list alone would generate O(maxDf²) candidates; the cap is part
    * of the operator contract (deterministic, oracle-replayable). One
    * fingerprint-keyed exchange builds the lists, the pair counts
    * aggregate on (id1, id2) with map-side combine, and the per-doc
    * n_fp frame joins back by id. Never all-pairs.
    */
  def winnowPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minShared: Int = 2,
      maxDf: Int = 100): DataFrame = {
    require(minShared >= 1, "winnowPairs: minShared >= 1")
    require(maxDf >= 2, "winnowPairs: maxDf >= 2 (1 admits no pair)")
    val fp = trackPersist(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol),
          graft.functions.TextFunctions.fingerprint(col(textCol), k, w).as("fps"))
        .withColumn("n_fp", size(col("fps")).cast("long"))
        .filter(col("n_fp") >= 1))
    // distinct (id, fp): fps is distinct within one row, but a re-fed
    // corpus can carry the same id on several rows — without this the
    // df cap here and the countDistinct-based report in winnowFpStats
    // would disagree about which fingerprints survive, and shared_fps
    // would double-count duplicate ids
    val idx = fp.select(col(idCol).as("_id"), explode(col("fps")).as("_fp"))
      .distinct()
    val rare = idx.groupBy(col("_fp")).agg(countDistinct(col("_id")).as("_f"))
      .filter(col("_f") <= maxDf).select(col("_fp"))
    // persisted for the same reason as containmentPairs' capped index:
    // both self-join sides re-derive the distinct+df-cap shuffles
    val capped = trackPersist(idx.join(rare, Seq("_fp")))
    // n_fp per id deduped the same way (max is deterministic if a
    // duplicated id ever carried different texts)
    val nfp = fp.groupBy(col(idCol).as("_nid")).agg(max(col("n_fp")).as("_nfp"))
    capped.as("a")
      .join(capped.as("b"),
        col("a._fp") === col("b._fp") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id1"), col("b._id").as("id2"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .join(nfp.select(col("_nid").as("id1"), col("_nfp").as("n_fp1")), Seq("id1"))
      .join(nfp.select(col("_nid").as("id2"), col("_nfp").as("n_fp2")), Seq("id2"))
      .withColumn("overlap_milli",
        expr("shared_fps * 1000 div least(n_fp1, n_fp2)"))
      .select(col("id1"), col("id2"), col("shared_fps"),
        col("n_fp1"), col("n_fp2"), col("overlap_milli"))
  }
}
