package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.pipeline.{Clustering, Curation, Dedup, Layout, Multimodal, Similarity}

/** Training-data pipeline query catalog: dedup, similarity search,
  * text analysis, multimodal plumbing — each with a DuckDB oracle that
  * mirrors the exact arithmetic (portable polynomial hash, left-to-right
  * float sums), so results hash-match bit-for-bit.
  *
  * Oracle SQL for the sketch operators (minhash/simhash/LSH) is
  * *generated* by the same Scala loops that build the Catalyst
  * expressions, keeping both sides structurally in sync.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  private val P = TextFunctions.P

  /** Scratch path (and catalog-name suffix) scoped to the data dir, so
    * gate runs at different scale factors never read each other's
    * side-effect tables (two concurrent runs, or a stale leftover from
    * a failed run at the other SF, would otherwise silently serve
    * wrong-scale data via the fixed location).
    */
  private def scopedTmp(prefix: String, dir: String): String = {
    val p = s"/tmp/${prefix}_${java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)}"
    // cross-run CACHES (rebuilt only when absent): the z8 audit layouts
    // (z8Audit rootsExist) and b1's bucketed join tables
    // (Layout.bucketedTableCached _SUCCESS check) — everything else is
    // run-scoped scratch registered for the end-of-run sweep (r11
    // verdict task 7; exemptions listed in the gate's /tmp receipt)
    if (prefix.startsWith("graft_z8_") || prefix == "graft_b1") p
    else graft.core.Scratch.track(p)
  }

  private def scopedName(prefix: String, dir: String): String =
    s"${prefix}_${java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)}"

  /** Bloom bitset size for the d8c gate — shared by the Spark query
    * and the oracle SQL so the two can never drift. */
  private val BloomM = 1 << 20

  /** z8's oracle: z-value interleave replayed (the z1 CTEs), both
    * layouts' per-bucket [min,max] for BOTH columns probed as in z7.
    * Shared by the z8 gate oracle and z9's advisor wrapper. */
  private lazy val z8OracleSql: String = {
    val zTerms = (0 until 8).flatMap(i => Seq(
      s"(((qp >> $i) & 1) << ${2 * i + 1})",
      s"(((qs >> $i) & 1) << ${2 * i})")).mkString(" + ")
    def block(layout: String, colName: String, probeCte: String,
          statCte: String, mn: String, mx: String): String =
        s"""SELECT '$layout' AS layout, '$colName' AS "column", probe,
           |    CAST(count(*) AS BIGINT) AS n_files,
           |    CAST(sum(CASE WHEN $mn <= probe AND probe <= $mx
           |         THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates
           |  FROM $probeCte, $statCte GROUP BY 1, 2, 3""".stripMargin
    s"""WITH mm AS (SELECT CAST(min(l_partkey) AS BIGINT) AS pmin,
         |  CAST(max(l_partkey) AS BIGINT) AS pmax,
         |  CAST(min(l_suppkey) AS BIGINT) AS smin,
         |  CAST(max(l_suppkey) AS BIGINT) AS smax FROM lineitem),
         |shft AS (SELECT *,
         |  CASE WHEN pmax = pmin THEN 0 ELSE length(bin(pmax - pmin)) END AS psh,
         |  CASE WHEN smax = smin THEN 0 ELSE length(bin(smax - smin)) END AS ssh
         |  FROM mm),
         |q AS (SELECT l_partkey, l_suppkey,
         |  ((CAST(l_partkey AS BIGINT) - pmin) << 8) >> psh AS qp,
         |  ((CAST(l_suppkey AS BIGINT) - smin) << 8) >> ssh AS qs
         |  FROM lineitem, shft),
         |zv AS (SELECT l_partkey, l_suppkey, $zTerms AS z FROM q),
         |zm AS (SELECT max(z) AS zmax FROM zv),
         |lin AS (SELECT least(7, (l_partkey - pmin) * 8 // (pmax - pmin + 1)) AS b,
         |          l_partkey, l_suppkey FROM lineitem, mm),
         |zb AS (SELECT least(7, z * 8 // (zmax + 1)) AS b,
         |         l_partkey, l_suppkey FROM zv, zm),
         |ls AS (SELECT b, min(l_partkey) AS pmn, max(l_partkey) AS pmx,
         |         min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lin GROUP BY 1),
         |zs AS (SELECT b, min(l_partkey) AS pmn, max(l_partkey) AS pmx,
         |         min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM zb GROUP BY 1),
         |pp AS (SELECT DISTINCT pmin + (pmax - pmin) * (2*i+1) // 8 AS probe
         |       FROM mm, LATERAL unnest(generate_series(0,3)) s(i)),
         |sp AS (SELECT DISTINCT smin + (smax - smin) * (2*i+1) // 8 AS probe
         |       FROM mm, LATERAL unnest(generate_series(0,3)) s(i)),
         |u AS (
         |  ${block("linear", "l_partkey", "pp", "ls", "pmn", "pmx")}
         |  UNION ALL
         |  ${block("linear", "l_suppkey", "sp", "ls", "smn", "smx")}
         |  UNION ALL
         |  ${block("zorder", "l_partkey", "pp", "zs", "pmn", "pmx")}
         |  UNION ALL
         |  ${block("zorder", "l_suppkey", "sp", "zs", "smn", "smx")})
         |SELECT layout, "column", probe, n_files, n_candidates,
         |  CAST((n_files - n_candidates) * 1000 // n_files AS BIGINT) AS skip_milli
         |FROM u""".stripMargin
  }

  /** z8's measured layout audit (linear vs z-order range buckets,
    * footer-stats skipping on both key columns) — shared by the z8
    * gate row and the z9 advisor that consumes the measurements.
    * Writes are overwrite-idempotent under scoped /tmp roots, and the
    * whole audit is memoized per (JVM, dir): a Verify/Bench run
    * executes BOTH z8 and z9, and without the memo the second entry
    * re-writes two full-table layouts it just wrote (~3 s at sf0.1 —
    * measured in the z9 bench row). The cached frame re-reads the
    * written parquet, so harness clearCache() cannot invalidate it.
    */
  private val z8AuditCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  // keyed by (session, dir): a cached frame is bound to the session
  // that built it, so a later session in the same JVM (suites that
  // restart sessions) rebuilds instead of reading through a stale
  // plan; entries whose scratch roots were tmp-cleaned are evicted
  private def z8Audit(s: SparkSession, dir: String): DataFrame = {
    // drop entries owned by stopped contexts, AND any other session's
    // entry for THIS dir: a session replaced via newSession() keeps the
    // shared context alive, so the isStopped sweep alone would pin the
    // old session (and its DataFrames) for the JVM lifetime (advisor
    // r11). One live (session, dir) entry at a time bounds the map; an
    // alternating-session caller pays a rebuild, never a leak. (Weak
    // keys can't work here: the cached DataFrame strongly references
    // its session, so a weak-keyed map would never collect.)
    z8AuditCache.keySet.removeIf(k =>
      k._1.sparkContext.isStopped || (k._2 == dir && !(k._1 eq s)))
    val rootsExist = Seq("linear", "zorder")
      .forall(n => new java.io.File(scopedTmp(s"graft_z8_$n", dir)).exists())
    if (!rootsExist) z8AuditCache.remove((s, dir))
    z8AuditCache.computeIfAbsent((s, dir), _ => z8AuditBuild(s, dir))
  }

  private def z8AuditBuild(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val Seq((_, pmin, pmax), (_, smin, smax)) =
      graft.pipeline.Layout.measureRanges(li, Seq("l_partkey", "l_suppkey"))
    val zc = Seq(graft.pipeline.Layout.ZCol(col("l_partkey"), pmin, pmax),
      graft.pipeline.Layout.ZCol(col("l_suppkey"), smin, smax))
    val withZ = li.withColumn("_zv", graft.pipeline.Layout.zValue(zc, 8))
    val zmax = withZ.agg(max(col("_zv"))).head.getLong(0)
    val linear = li.withColumn("bucket",
      expr(s"least(7L, (l_partkey - ${pmin}L) * 8 div ${pmax - pmin + 1}L)"))
    val zord = withZ.withColumn("bucket",
      expr(s"least(7L, _zv * 8 div ${zmax + 1}L)")).drop("_zv")
    val pprobes = (0 until 4).map(i => pmin + (pmax - pmin) * (2L * i + 1) / 8).distinct
    val sprobes = (0 until 4).map(i => smin + (smax - smin) * (2L * i + 1) / 8).distinct
    def audited(frame: DataFrame, name: String) = {
      val root = scopedTmp(s"graft_z8_$name", dir)
      frame.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(root)
      Seq(("l_partkey", pprobes), ("l_suppkey", sprobes)).map { case (c, ps) =>
        // per-BUCKET candidate units: a physical file split must not
        // change n_files/n_candidates — the oracle replays per-bucket
        // intervals from the logical table (the z6/z7 invariance)
        graft.pipeline.Layout.skippingEffectiveness(
            graft.pipeline.Layout.bucketStats(
              graft.pipeline.Layout.fileStats(s, root, c,
                requirePathToken = "bucket=")), ps)
          .withColumn("column", lit(c)).withColumn("layout", lit(name))
      }.reduce(_ unionByName _)
    }
    audited(linear, "linear").unionByName(audited(zord, "zorder"))
      .select(col("layout"), col("column"), col("probe"), col("n_files"),
        col("n_candidates"), col("skip_milli"))
  }

  /** Deterministic integer axis for the s16b projection gate — shared
    * by the Spark query and the generated oracle SQL. */
  private val PcaAxis: Array[Long] =
    Array.tabulate(64)(k => (((k + 1) * 37) % 19 - 9).toLong)

  /** Deterministic literal LM weight table for the tx10 perplexity
    * gate: non-negative quantized NLL per bigram bucket (an LCG over
    * the bucket index — the dsirStubWeights pattern), generated here
    * and rendered into the oracle SQL so the gate checks the gram
    * hashing, bucket lookup, exact-integer fold, and discrete-quantile
    * tertile split with no data-fitted model (and no libm) anywhere.
    */
  private[graft] val perplexityStubWeights: Seq[Long] =
    (0 until 1024).map(b => (b.toLong * 1103515245L + 12345L) % 12000L)

  // ---- shared DuckDB SQL fragments --------------------------------------

  /** Portable polynomial hash of a string expression (mirror of
    * TextFunctions.polyHash: list_reduce seeds with the first element,
    * which equals Spark's 0-seeded fold since 0*31+c0 = c0).
    */
  private[graft] def phSql(s: String): String =
    s"list_reduce([CAST(unicode(c) AS BIGINT) for c in string_split_regex($s,'')], (h,c) -> (h*31+c) % $P)"

  /** BPE oracle CTE chain: word/freq table, char symbols, then per
    * round a pair count, deterministic argmax (`b{r}`), and a greedy
    * leftmost merge replayed as a per-word recursive walk (`w{r}`).
    * Callers prepend `WITH RECURSIVE`. */
  private def bpeCtes(rounds: Int): String = {
    def roundCtes(r: Int): String = {
      val prev = s"w${r - 1}"
      s"""p$r AS (SELECT syms[i] AS pa, syms[i+1] AS pb, sum(freq) AS cnt
         |  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms)-1)) AS i FROM $prev)
         |  GROUP BY 1,2),
         |b$r AS (SELECT pa, pb, CAST(cnt AS BIGINT) AS cnt FROM p$r
         |  ORDER BY cnt DESC, pa ASC, pb ASC LIMIT 1),
         |walk$r AS (
         |  SELECT word, freq, syms, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM $prev
         |  UNION ALL
         |  SELECT word, freq, syms,
         |    CASE WHEN i < len(syms) AND syms[i]=b$r.pa AND syms[i+1]=b$r.pb
         |         THEN i+2 ELSE i+1 END,
         |    CASE WHEN i < len(syms) AND syms[i]=b$r.pa AND syms[i+1]=b$r.pb
         |         THEN list_append(acc, b$r.pa||b$r.pb) ELSE list_append(acc, syms[i]) END
         |  FROM walk$r, b$r WHERE i <= len(syms)),
         |w$r AS (SELECT word, freq, acc AS syms FROM walk$r WHERE i = len(syms)+1)""".stripMargin
    }
    s"""wc AS (SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text,' ')) AS t FROM documents)
       |  WHERE t <> '' GROUP BY 1),
       |w0 AS (SELECT word, freq, string_split_regex(word,'') AS syms FROM wc),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  /** APPLY-only BPE walk over a FIXED merge list (tx15c): the same
    * leftmost-non-overlapping recursive walk as [[bpeCtes]]' rounds,
    * without the learning step — literal (a, b) per round. */
  private def bpeApplyCtes(merges: Seq[(String, String)]): String = {
    val rounds = merges.zipWithIndex.map { case ((a, b), idx) =>
      val r = idx + 1
      val prev = s"w${r - 1}"
      s"""walk$r AS (
         |  SELECT word, syms, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM $prev
         |  UNION ALL
         |  SELECT word, syms,
         |    CASE WHEN i < len(syms) AND syms[i]='$a' AND syms[i+1]='$b'
         |         THEN i+2 ELSE i+1 END,
         |    CASE WHEN i < len(syms) AND syms[i]='$a' AND syms[i+1]='$b'
         |         THEN list_append(acc, '${a + b}') ELSE list_append(acc, syms[i]) END
         |  FROM walk$r WHERE i <= len(syms)),
         |w$r AS (SELECT word, acc AS syms FROM walk$r WHERE i = len(syms)+1)""".stripMargin
    }
    s"""wd AS (SELECT DISTINCT t AS word
       |  FROM (SELECT unnest(string_split(text,' ')) AS t FROM documents) WHERE t <> ''),
       |w0 AS (SELECT word, string_split_regex(word,'') AS syms FROM wd),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** doc_id + distinct word-3-gram shingles CTEs over `documents`. */
  private[graft] val shingleCtes =
    """toks AS (SELECT doc_id, text, string_split(text,' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(generate_series(1, len(w)-2)) AS i, w FROM toks),
      |sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s FROM g)""".stripMargin

  /** Deterministic literal weight table for the p6 scoring-fold gate:
    * a fixed LCG over the bucket index, generated HERE and rendered
    * into the oracle SQL by [[dsirStubWeightsSql]] — both engines use
    * the byte-identical table, so the gate checks the gram hashing,
    * bucketing, and exact-integer fold with no libm anywhere.
    */
  private[graft] val dsirStubWeights: Seq[Long] =
    (0 until 1024).map(b => (b.toLong * 1103515245L + 12345L) % 2000001L - 1000000L)

  /** The same LCG as [[dsirStubWeights]], as a DuckDB expression over
    * a bucket column `b`. */
  private def dsirStubWeightsSql(b: String): String =
    s"($b*1103515245 + 12345) % 2000001 - 1000000"

  /** (doc_id, lang, quality) CTE chain mirroring
    * TextFunctions.qualityScore — shared by the p8/p8b oracles. */
  private lazy val qualityCtes: String = {
    val stopEn = TextFunctions.StopEn.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""b AS (SELECT doc_id, lang, text, string_split(text,' ') AS w, len(text) AS L
       |           FROM documents),
       |c AS (SELECT doc_id, lang,
       |  (L - len(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))*1.0 / greatest(L, 1) AS punct_ratio,
       |  len(list_filter(w, t -> list_contains($stopEn, t)))*1.0 / greatest(len(w), 1) AS stop_ratio,
       |  len(w) AS n_tok,
       |  list_sum([len(t) for t in w])*1.0 / greatest(len(w), 1) AS mean_len
       |  FROM b),
       |q AS (SELECT doc_id, lang,
       |        0.4*least(n_tok/100.0, 1.0) + 0.3*(1.0 - punct_ratio) +
       |        0.2*stop_ratio + 0.1*least(mean_len/8.0, 1.0) AS quality FROM c)""".stripMargin
  }

  private def cosSql(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) / " +
      s"(sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))) * " +
      s"sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"

  /** IVF cell-assignment CTE body (mirror of Similarity.argmaxCell /
    * topCells over a `cents(c, ce)` CTE): rank cells by cosine desc,
    * cell asc, with the NaN guard the Scala folds apply — zero-norm
    * vectors (all-NaN cosines) are unsearchable and drop out rather
    * than ranking NaN-greatest. Shared by the s3/s5/s6 oracles.
    */
  private def ivfAssignSql(name: String, rnPred: String, whereExtra: String = ""): String =
    s"""$name AS (
       |  SELECT vec_id, embedding, c AS cell FROM (
       |    SELECT vec_id, embedding, c,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY cos DESC, c ASC) AS rn
       |    FROM (SELECT e.vec_id, e.embedding, cents.c,
       |                 ${cosSql("e.embedding", "cents.ce")} AS cos
       |          FROM embeddings e CROSS JOIN cents $whereExtra)
       |    WHERE NOT isnan(cos)) WHERE $rnPred)""".stripMargin

  /** Sign-LSH bucket SQL (mirror of Similarity.signLshBucket). */
  private def bucketSql(vec: String, planes: Int = 8, dims: Int = 64): String = {
    val bits = (0 until planes).map { j =>
      val plane = s"list_transform(generate_series(0, ${dims - 1}), d -> " +
        s"CAST((1103515245*(${j.toLong * dims} + d) + 12345) % 2000003 - 1000001 AS DOUBLE))"
      s"CASE WHEN list_dot_product(CAST($vec AS DOUBLE[]), $plane) > 0.0 THEN ${1L << j} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }

  /** SimHash SQL over a precomputed token-hash list column `hs`
    * (mirror of Dedup.simhash: per-bit independent re-hash).
    */
  private def simhashSql(hs: String, bits: Int = 32): String =
    (0 until bits).map { b =>
      s"CASE WHEN 2*len(list_filter($hs, h -> ((h * ${2L * b + 3}) % $P) & 1 = 1)) > len($hs) THEN ${1L << b} ELSE 0 END"
    }.mkString("(", " + ", ")")

  // ---- queries ----------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup: hash-groupBy on text, keep min id
    "d1_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")),

    // ---- exact dedup, hash-first: the corpus-wide exchange moves
    // (hash, id) only; text re-shuffles solely for multiplicity>1
    // hashes (exact collision-safe verify)
    "d1b_dedup_exact_hash" -> ((s, dir) =>
      Dedup.exactGroupsByHash(t(s, dir, "documents"), "text", "doc_id")),

    // ---- n-gram Jaccard near-dup via prefix-filtered inverted index.
    // The corpus is AUGMENTED with a deterministic planted near-dup
    // slice — every 101st sufficiently-long doc gets a twin whose
    // first word is replaced by a literal (J = (m-1)/(m+1) ≥ 0.83 for
    // m ≥ 11 distinct trigrams) — so the ≥0.8 gate compares NONZERO
    // output at EVERY scale factor by construction. Rationale (r11
    // verdict task 3): ScaleSmoke's every-3rd-word replica perturbation
    // puts a doc-specific token in every word trigram, so no organic
    // sf1 pair can clear any threshold and the sf1 ledger row gated
    // zero rows (branch coverage, not evidence). The twin derivation is
    // replayed verbatim in the oracle SQL — both engines see the same
    // augmented corpus, nothing is hidden from the compare.
    "d2_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = docs
        .filter(col("doc_id") % 101 === 0 &&
          size(split(col("text"), " ")) >= 13)
        .select((col("doc_id") + lit(2000000000L)).as("doc_id"),
          concat(lit("graftdup"),
            expr("substring(text, instr(text, ' '))")).as("text"))
      Dedup.jaccardPairs(docs.unionByName(twins), "doc_id", "text",
        n = 3, threshold = 0.8)
    }),

    // ---- asymmetric containment: |A∩B|/|A| catches a small doc
    // embedded in a big host (J ≤ |A|/|B| — invisible to any Jaccard
    // threshold); df-capped inverted index for candidates, exact
    // verify on full shingle-hash sets
    "d18_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, tMilli = 500, maxDf = 100)),

    // ---- winnowing (MOSS) fingerprint pairs: positional copied-
    // passage detection over the tx4 fingerprint kernel — any shared
    // verbatim run of >= k+w-1 = 27 chars is GUARANTEED to share a
    // fingerprint (the set-overlap families d2/d3/d18 dilute as the
    // host doc grows; this one cannot miss a long-enough quote).
    // k=20/w=8 chosen by the measured selectivity ladder on this
    // small-vocab corpus: (8,4) matches 77% of ALL pairs (8-char runs
    // repeat corpus-wide — output-quadratic noise), (20,8) leaves the
    // 145 genuinely-copied-passage pairs
    "d19_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 20, w = 8, minShared = 2, maxDf = 100)),

    // ---- d19's enumeration-free REPORT twin: fingerprint-df
    // histogram + the pair-slot mass each df level feeds the candidate
    // join (metadata-sized where d19's sf1 output is 103k true pairs);
    // the knob-setting read before a 100 TB winnowing run
    "d19b_winnow_stats" -> ((s, dir) =>
      Dedup.winnowFpStats(t(s, dir, "documents"), "doc_id", "text",
        k = 20, w = 8, maxDf = 100)),

    // ---- MinHash + LSH banding (shingle→minhash→band→bucket-join)
    "d3_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5)),

    // ---- per-BAND occupancy audit (r13 mutation campaign: dropping an
    // LSH band survived the whole gate — every sf0.01 near-dup pair
    // collides in several bands, and no entry observed band membership
    // itself). One row per band: bucket count, doc mass, within-bucket
    // pair mass — the band-balance audit an LSH operator runs before
    // trusting its recall, and a gate that fails the moment any band
    // is added, dropped, or re-hashed.
    "d3e_band_occupancy" -> ((s, dir) => {
      val sigs = t(s, dir, "documents")
        .select(col("doc_id").as("_id"),
          Dedup.minhashSignature(col("text"), 3, 16).as("_sig"))
        .filter(col("_sig").getItem(0).isNotNull)
      Dedup.bandBucketsFromSigs(sigs, "_id", "_sig", numHashes = 16, bands = 4)
        .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("g"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("g")).as("n_docs"),
          sum(expr("g * (g - 1) DIV 2")).as("pair_mass"))
    }),

    // ---- pair REPORTS: per-relation-value pair/doc counts computed
    // analytically from signature-group occupancies — the audit
    // surface for corpora where enumerating pairs is output-quadratic
    // (the sf1 smoke's d4 93× case stays metadata-sized here)
    "d3b_minhash_stats" -> ((s, dir) =>
      Dedup.minhashPairStats(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5)),
    "d4b_simhash_stats" -> ((s, dir) =>
      Dedup.simhashPairStats(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 2)),

    // ---- soft dedup: duplication-weighted survival (1/group-size
    // hash gate) — the middle ground between keeping everything and
    // d7's hard one-per-group drop
    "d17_soft_dedup" -> ((s, dir) =>
      Dedup.softDedupSample(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 2)
        .select(col("doc_id"), col("n_chars"), col("dup_count"))),

    // ---- LSH calibration: estimated-vs-exact Jaccard over a
    // deterministic pair sample (integer intersection/union mass —
    // the pre-run threshold audit)
    "d3c_lsh_calibration" -> ((s, dir) =>
      Dedup.lshCalibrationReport(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5, sampleMod = 7)),

    // ---- calibration -> band-config tuning table: integer-only pick
    // of the (bands, rows) pair for a target exact-Jaccard precision
    "d3d_lsh_threshold_pick" -> ((s, dir) =>
      Dedup.lshThresholdPick(
        Dedup.lshCalibrationReport(t(s, dir, "documents"), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.5, sampleMod = 7),
        numHashes = 16, targetNum = 4, targetDen = 5)),

    // ---- SimHash sketch per document
    "d4_simhash" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Dedup.simhash(col("text")).as("simhash"))),

    // ---- SimHash near-dup pairs (16-bit-block candidates, Hamming<=2)
    "d4_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 2)),

    // ---- the DECLARATIVE simhash under the gate, on a tie-dense
    // input (r13 mutation campaign: simhashDeclarative was spec-only —
    // a majority-tie flip `>`→`>=` survived the whole catalog). A
    // 2-token prefix makes per-bit ties ~50% likely, so the strict
    // majority rule itself is load-bearing in every output row.
    "d4c_simhash_declarative" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Dedup.simhashDeclarative(
          concat_ws(" ", slice(split(col("text"), " "), 1, 2))).as("simhash"))),

    // ---- dedup group resolution: connected components over the
    // simhash near-dup graph (keep = doc_id == component). Consumes
    // the component-equivalent linear EDGE set, never pair cliques
    "d6_dedup_groups" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.simhashEdges(t(s, dir, "documents"), "doc_id", "text", maxHamming = 2),
        "id1", "id2")
        .select(col("id").as("doc_id"), col("component"))),

    // ---- d6 with the DISTRIBUTED star-contraction forced
    // (localEdgeThreshold = 0): r13 mutation campaign — at sf0.01 the
    // whole edge set fits under the 500k local-tail threshold, so the
    // contraction rounds (the code path that actually runs at 100 TB)
    // were never executed by the gate, and a seeded min→max bug in the
    // neighborhood aggregate survived. Same oracle as d6: the label
    // choice is path-independent, only the execution branch differs.
    "d6c_components_distributed" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.simhashEdges(t(s, dir, "documents"), "doc_id", "text", maxHamming = 2),
        "id1", "id2", localEdgeThreshold = 0L)
        .select(col("id").as("doc_id"), col("component"))),

    // ---- the dedup SAVINGS sheet: per group size, exact token mass
    // a keep-one-representative pass drops — "what does this dedup
    // buy", read before committing the corpus-wide pass
    "d20_dedup_savings" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.dedupSavings(docs, "doc_id", "text",
        Dedup.connectedComponents(
          Dedup.simhashEdges(docs, "doc_id", "text", maxHamming = 2),
          "id1", "id2"))
    }),

    // ---- end-to-end dedup: canonical doc per simhash near-dup group
    // plus all pair-less docs survive
    "d7_dedup_corpus" -> ((s, dir) =>
      Dedup.nearDupDedup(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id",
        Dedup.simhashEdges(t(s, dir, "documents"), "doc_id", "text", maxHamming = 2))),

    // ---- the canonical MinHash dedup pipeline end-to-end: LSH pairs
    // -> connected components -> min-id survivor per group (d7's shape
    // over the MinHash candidate generator instead of SimHash)
    "d13_minhash_dedup" -> ((s, dir) =>
      Dedup.nearDupDedup(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id",
        Dedup.minhashEdges(t(s, dir, "documents"), "doc_id", "text",
          n = 3, numHashes = 16, bands = 4, threshold = 0.5))),

    // ---- exact-substring duplication stats (Lee et al. 2021): per-doc
    // fraction of word-10-gram positions whose gram repeats corpus-wide
    "d9_substring_dup" -> ((s, dir) =>
      Dedup.substringDupStats(t(s, dir, "documents"), "doc_id", "text",
        w = 10, minCount = 2)),

    // ---- ExactSubstr removal: tokens covered by corpus-duplicated
    // word-10-grams cut out, survivors rejoined (Lee et al. 2021)
    "d12_substring_remove" -> ((s, dir) =>
      Dedup.substringDupRemove(t(s, dir, "documents"), "doc_id", "text",
        w = 10, minCount = 2)),

    // ---- embedding-cosine near-dup pairs on the SCALE path: sign-LSH
    // bucket equi-join (never all-pairs); exact variant kept below
    "d5_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.45,
        blocked = true)),

    // ---- exact all-pairs variant, bounded to a fixed id slice: it
    // exists to verify the bucketed path's arithmetic, and all-pairs
    // over the full table is exactly the shape the scale path forbids
    "d5b_embed_neardup_exact" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(
        t(s, dir, "embeddings").filter(col("vec_id") < 500),
        "vec_id", "embedding", 0.45)),

    // ---- ANN brute-force cosine top-k (broadcast queries)
    "s1_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
    }),

    // ---- pseudo-relevance feedback (Rocchio expansion): round-1
    // top-5 neighbors summed on the integer grid (order-free; cosine
    // is scale-invariant so the sum IS the mean direction) → round-2
    // retrieval against the expanded vector — the recall rescue for
    // off-cluster query embeddings
    "s21_prf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.prfTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, fb = 5)
    }),

    // ---- MMR diversified retrieval: greedy λ·rel − (1−λ)·max-sim
    // selection over the top-10 candidates, ALL-INTEGER dot products
    // on the quantized grid, the greedy loop a pure nested-HOF column
    // expression — the de-duplicating re-rank plain top-k lacks
    "s22_mmr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mmrTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 4, c = 10, lambdaMilli = 700)
    }),

    // ---- kNN label probe: embedding-quality eval — majority label of
    // the 5 exact nearest neighbors vs the query's own label
    "s11_knn_label_probe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnLabelProbe(emb, emb.filter(col("vec_id") < 16),
        "vec_id", "embedding", "label", k = 5)
    }),

    // ---- the same eval riding the IVF index (the 100 TB tier):
    // narrow cell assignment, nprobe=2 query fan-out, cell equi-join
    "s12_knn_probe_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.knnLabelProbeIvf(emb, emb.filter(col("vec_id") < 16),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", "label", k = 5, nprobe = 2)
    }),

    // ---- ANN via deterministic sign-LSH buckets
    "s2_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 3, planes = 8, dims = 64)
    }),

    // ---- ANN via IVF cells (coarse quantizer = low-id vectors)
    "s3_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", k = 3)
    }),

    // ---- FILTERED vector search: top-k among corpus rows passing a
    // metadata predicate (the "search within label/tenant/language
    // slice" request) — the filter composes BEFORE the IVF candidate
    // join, so pruned rows never reach a cosine; assignment per vector
    // is independent, so cells are unchanged
    "s14_filtered_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
        emb.filter(pmod(col("label"), lit(2)) === 0),
        emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", k = 3)
    }),

    // ---- contrastive hard-negative mining: top-5 most-similar
    // vectors with a DIFFERENT label per anchor, candidates from the
    // nprobe=2 IVF probe — the per-pair label predicate no static
    // corpus filter (s14) can express
    "s17_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", "label", k = 5, nprobe = 2)
    }),

    // ---- IVF with the nprobe recall knob: each query probes its 2
    // nearest cells (corpus layout unchanged, query fan-out only)
    "s6_ann_ivf_nprobe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", k = 3, nprobe = 2)
    }),

    // ---- PQ encoding: (vec_id, subspace, code) — narrow argmax folds
    // over hash-seeded codebook literals, zero Exchange to encode
    "c3_pq_codes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqEncode(emb, "vec_id", "embedding",
        Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8))
    }),

    // ---- ANN via PQ asymmetric distance: exact queries against
    // codebook reconstructions (m bytes per corpus vector, the
    // billion-scale compressed layout; compose with IVF cells = IVF-PQ)
    "s4_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3,
        Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8))
    }),

    // ---- ANN quality report: recall@k of the IVF index against the
    // brute-force ground truth, per query — the measurement that sizes
    // the nprobe knob before a production rollout
    "s9_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
        .select(col("qid"), col("cid"))
      val approx = Similarity.ivfTopK(emb, q,
          emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
          "vec_id", "embedding", k = 3, nprobe = 2)
        .select(col("qid"), col("cid"), lit(1).as("_hit"))
      exact.join(approx, Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("_hit"), lit(0))).as("n_hit"))
        .withColumn("recall_at_3", col("n_hit") / lit(3.0))
    }),

    // ---- the (nprobe, kCoarse) grid's pinned point: kCoarse=16,
    // nprobe=4 — a second cell of the AnnRecallStudy curve under the
    // oracle gate, so the recall table in SCALE.md has a hash-checked
    // anchor at a different probe fraction than s9's (8, 2)
    "s9b_ivf_recall_grid" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
        .select(col("qid"), col("cid"))
      val approx = Similarity.ivfTopK(emb, q,
          emb.filter(col("vec_id") >= 100 && col("vec_id") < 116),
          "vec_id", "embedding", k = 3, nprobe = 4)
        .select(col("qid"), col("cid"), lit(1).as("_hit"))
      exact.join(approx, Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("_hit"), lit(0))).as("n_hit"))
        .withColumn("recall_at_3", col("n_hit") / lit(3.0))
    }),

    // ---- dimension-truncation (matryoshka) recall audit: top-3 by
    // cosine over the FIRST d components vs the full-dim ground truth,
    // for d in {8, 16, 32} — the measured evidence for storing
    // narrower vectors (each halving of d halves the index bytes and
    // scan cost at corpus scale; this row says what recall that buys)
    "s18_dim_truncation_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
        .select(col("qid"), col("cid"))
      Seq(8, 16, 32).map { d =>
        val et = emb.select(col("vec_id"),
          slice(col("embedding"), 1, d).as("embedding"))
        val approx = Similarity.bruteForceTopK(
            et, et.filter(col("vec_id") < 8), "vec_id", "embedding", 3)
          .select(col("qid"), col("cid"), lit(1L).as("_hit"))
        exact.join(approx, Seq("qid", "cid"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
          .select(lit(d.toLong).as("dim"), col("qid"), col("n_hit"))
      }.reduce(_ unionByName _)
    }),

    // ---- int8 scalar-quantization recall audit (s18's sibling):
    // per-vector symmetric quantization q_i = trunc(x_i·127/max|x|),
    // top-3 by cosine over the INTEGER vectors (cosine is
    // scale-invariant per vector, so no reconstruction) vs the
    // full-precision ground truth — the 4x-smaller-index question,
    // answered with measured hits instead of a rule of thumb
    "s19_int8_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", 3)
        .select(col("qid"), col("cid"))
      val qz = emb
        .withColumn("_mx", aggregate(
          transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (a, x) => greatest(a, x)))
        // an all-zero vector has no direction to preserve — drop it on
        // BOTH sides (Spark's 0/0 would be NaN and rank FIRST under
        // DESC while DuckDB's div-by-zero NULL ranks last)
        .filter(col("_mx") > 0.0)
        .select(col("vec_id"),
          // trunc-to-long then back to double: the integer grid both
          // engines agree on, in the element type the cosine kernel
          // reads (a long-backed array would be misread as doubles)
          transform(col("embedding"),
            x => (x.cast("double") * lit(127.0) / col("_mx"))
              .cast("long").cast("double"))
            .as("embedding"))
      val approx = Similarity.bruteForceTopK(
          qz, qz.filter(col("vec_id") < 8), "vec_id", "embedding", 3)
        .select(col("qid"), col("cid"), lit(1L).as("_hit"))
      exact.join(approx, Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
    }),

    // ---- two-stage ANN: PQ recall (compressed codes only) + exact
    // re-rank of the per-query candidate pool — compression error is
    // confined to candidate choice, reported scores are exact
    "s8_ann_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqRerankTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3, kCoarse = 12,
        Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8))
    }),

    // ---- one-pass exact Gram matrix over quantized embeddings: the
    // distributed half of PCA/whitening — n, per-dim sums, upper-tri
    // products reduced to ONE ~17 KB map-side-combined buffer per
    // partition; the d×d eigh then runs on the driver (Pca.fit)
    "s16_gram_matrix" -> ((s, dir) =>
      graft.pipeline.Pca.gramTriples(t(s, dir, "embeddings"), "embedding", 64)),

    // ---- exact integer projection of the quantized vectors onto a
    // literal axis — the oracle-gated fold beneath Pca.project (the
    // eigen-derived axes are spec-tested; this pins the kernel)
    "s16b_axis_project" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"),
        graft.pipeline.Pca.axisProjectQuantized(col("embedding"), PcaAxis)
          .as("proj"))),

    // ---- per-label Gram: one buffer per key through the same
    // map-side-combined aggregate — per-domain covariance in one pass
    // (drift comparison / per-group whitening input)
    "s16c_gram_by_label" -> ((s, dir) =>
      graft.pipeline.Pca.gramTriplesBy(
        t(s, dir, "embeddings"), Seq("label"), "embedding", 64)),

    // ---- T1 dict-basket variant: last per basket key
    "t1b_basket_last" -> ((s, dir) =>
      graft.state.StateOps.last(t(s, dir, "events"), "event_id",
        basketKey = Some("event_type"))),

    // ---- hopping (sliding) event-time windows: 1h width, 30min slide
    // — each event lands in two overlapping buckets (count/max exact)
    "a12_hopping_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
        .withColumn("bucket", col("window.start"))
        .drop("window")),

    // ---- session windows over event time (per-user activity sessions).
    // The session value mass is an integer-milli sum (floor(value·1000)
    // as BIGINT): a double sum is accumulation-order-dependent, and at
    // sf1 the replicated 10-event sessions summed in different orders on
    // the two engines — last-ulp diffs that re-SORT the compared rows
    // and break positional alignment (found by the sf1 gate; the a11s
    // twin already summed integers)
    "a11_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("sum_value_milli"))
        .withColumn("session_start", col("session_window.start"))
        .drop("session_window")),

    // ---- token counting (whitespace + BPE-ish regex lexer)
    "tx1_token_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))),

    // ---- quality scoring (length/punct/stopword ratios)
    "tx2_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.punctRatio(col("text")).as("punct_ratio"),
        TextFunctions.stopwordRatio(col("text")).as("stop_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))),

    // ---- language ID (stopword n-gram heuristic + CJK ratio)
    "tx3_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_detected"))),

    // ---- normalization round-trip (applied to an upper-cased copy so
    // the transform is non-vacuous on the already-lowercase corpus) +
    // repetition-ratio quality signal
    "tx5_normalize_repetition" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.normalize(upper(col("text"))).as("norm"),
        TextFunctions.repetitionRatio(col("text")).as("repetition"))),

    // ---- the one-scan annotation bundle: every per-document signal a
    // curation pipeline wants (token count, quality, language,
    // repetition) computed in a SINGLE pass — all fused codegen'd
    // expressions, zero shuffle; at 100 TB each separate annotation
    // pass is a full corpus scan, so fusion is the point
    "tx9_annotate_bundle" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langId(col("text")).as("lang_detected"),
        TextFunctions.repetitionRatio(col("text")).as("repetition"))),

    // ---- winnowing document fingerprint (rolling hash), exploded to
    // (doc_id, fp) rows — the gate-friendly shape (the driver's oracle
    // harness cannot lex-sort list columns); docs too short to window
    // contribute zero rows on both sides
    "tx4_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        // materialize the array in a projection BELOW the Generate:
        // inlining the nested-transform expression into explode() makes
        // the generator evaluate it interpreted (measured 64s vs ~1s)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text"), k = 8, w = 4).as("fps"))
        .select(col("doc_id"), explode(col("fps")).as("fp"))),

    // ---- multimodal: batch decode/feature-extract over binary
    // payloads; 8-dim feature unnested to (media_id, bin, value) rows
    // (gate-friendly: no list columns in the output)
    "mm1_media_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(graft.testing.MediaFixtures.syntheticMedia(t(s, dir, "documents")))
        .select(col("media_id"), col("kind"), col("n_bytes"),
          posexplode(col("feature")).as(Seq("bin", "value")))),

    // ---- codec dispatch at MINIMUM payload length (mutations g028/
    // g029/g030/g031/g042: flipping a `length >= min` dispatch guard
    // or the chunk-walk bound to strict survived — every fixture
    // payload exceeds its format's minimum). Exact-minimum,
    // zero-content media are VALID inputs with hand-derivable
    // features: a 44-byte header-only WAV (0 samples), a 54-byte 0x0
    // BMP, and a 57-byte 0x0 PNG (sig + IHDR + empty IDAT + IEND,
    // CRCs real) all decode to the all-zeros histogram; a 4-byte
    // SOI+EOI JPEG routes to the strict decoder, which nulls it (no
    // frame) so it emits NO rows — under a flipped guard each falls
    // through to the stub codepoint histogram instead (nonzero values
    // / phantom rows), and a strict chunk-walk bound never sees the
    // PNG's final IEND (null, rows vanish).
    "mm9_payload_boundaries" -> ((s, dir) => {
      import s.implicits._
      val wavHex = "52494646" + "24000000" + "57415645" +
        "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
        "803e0000" + "0200" + "1000" + "64617461" + "00000000"
      val bmpHex = "424d" + "36000000" + "00000000" + "36000000" +
        "28000000" + "00000000" + "00000000" + "0100" + "1800" +
        "00000000" + "00000000" + "0000000000000000" + "0000000000000000"
      val pngHex = "89504e470d0a1a0a" +
        "0000000d" + "49484452" + "00000000" + "00000000" + "08" + "00" +
        "00" + "00" + "00" + "1ee023ce" +
        "00000000" + "49444154" + "35af061e" +
        "00000000" + "49454e44" + "ae426082"
      // 4x2 gray PNG, every scanline Paeth-filtered, pixels chosen so
      // the predictor hits BOTH value-differing tie patterns — occ1
      // (pa==pc, spec picks a=13 over c=9) and occ2 (pb==pc, picks
      // b=6 over c=10) — making the tie-break ORDER itself oracle-
      // visible (mutations g035/g036); pixels [9,7,10,6,13,25,12,30]
      val pngTieHex = "89504e470d0a1a0a0000000d4948445200000004000000020" +
        "8000000005ac322bf0000001249444154789c63e1fcc7fc878585e7b3040010" +
        "b6032afc1580a10000000049454e44ae426082"
      // media 6: the 12-byte RIFF/AVI boundary — routes to the strict
      // demuxer (no hdrl -> null, NO rows); a flipped length guard
      // (g051) sends it to the stub instead (8 phantom rows)
      val media = Seq((1L, "wav", wavHex), (2L, "bmp", bmpHex),
        (3L, "jpeg", "ffd8ffd9"), (4L, "png", pngHex), (5L, "png", pngTieHex),
        (6L, "avi", "5249464604000000" + "41564920"))
        .toDF("media_id", "kind", "hex")
        .select(col("media_id"), col("kind"), unhex(col("hex")).as("payload"))
      Multimodal.decodeFeatures(media)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          posexplode(col("feature")).as(Seq("bin", "value")))
    }),

    // ---- multimodal: MJPEG intra-frame decode — video features from
    // DECODED PIXELS (real per-frame JPEG bitstream decode inside the
    // AVI demux), not frame bytes; constant 8×8 blocks make the decode
    // bit-exact, so the pixel-class histogram equals the codepoint-
    // class shares and the raw-AVI value oracle applies verbatim
    // (the repartition spreads the per-doc encode+decode across cores —
    // a one-file gate input otherwise runs the codec nearly serial; at
    // corpus scale the input's own partitioning provides this)
    "mm4_mjpeg_pixels" -> ((s, dir) =>
      Multimodal.decodeFeatures(graft.testing.MediaFixtures.mjpegMedia(
          t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)))
        .select(col("media_id"), posexplode(col("feature")).as(Seq("bin", "value")))),

    // ---- multimodal: COLOR baseline JPEG (YCbCr 4:2:0) decode —
    // per-image RGB mass from decoded pixels; the fixture's DC-only
    // MCUs and >=128 chroma make decode + fixed-point color transform
    // integer-exact, so the sums are a pure function of the text
    "mm5_color_pixels" -> ((s, dir) =>
      Multimodal.colorStats(graft.testing.MediaFixtures.colorJpegMedia(
        t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)))),

    // ---- multimodal: audio loudness/silence segmentation over
    // DECODED PCM — 4-sample frames, silent = zero absolute mass,
    // longest silent run + loudest frame + total energy, all exact
    // integers recomputable from the fixture's cp&7 samples. The
    // pre-transcription triage (skip dead air, route loud clips)
    "mm6_audio_segments" -> ((s, dir) =>
      Multimodal.audioSegments(
        graft.testing.MediaFixtures.syntheticMedia(t(s, dir, "documents")),
        frame = 4)),

    // ---- multimodal: scene-cut detection over DECODED AVI frames —
    // consecutive-frame histogram L1 vs the pair mass, integer
    // cross-multiplied; the shot-boundary pass before per-scene frame
    // sampling (mm2's stride is the blind alternative)
    "mm7_scene_cuts" -> ((s, dir) =>
      Multimodal.sceneCuts(
        graft.testing.MediaFixtures.syntheticMedia(t(s, dir, "documents"))
          .filter(col("kind") === "video"),
        tMilli = 500)),

    // ---- multimodal: perceptual image dedup — average hash over
    // DECODED BMP pixels (64 evenly-spaced samples, integer
    // mean-compare bits) + exact-signature dup groups; the image-side
    // dedup signature text dedup cannot provide
    "mm8_image_ahash" -> ((s, dir) =>
      Multimodal.imageAHashGroups(
        graft.testing.MediaFixtures.syntheticMedia(t(s, dir, "documents"))
          .filter(col("kind") === "image"))),

    // ---- multimodal: video frame sampling
    "mm2_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(graft.testing.MediaFixtures.syntheticMedia(t(s, dir, "documents")), stride = 4)),

    // ---- cross-modal retrieval composition: decoded media features
    // flow straight into ANN — feature-extract (partition-local stub
    // codec) then brute-force cosine top-3 per query medium
    "mm3_media_similarity" -> ((s, dir) => {
      val feats = Multimodal.decodeFeatures(graft.testing.MediaFixtures.syntheticMedia(t(s, dir, "documents")))
        .select(col("media_id"), col("feature"))
        // NULL-text docs are excluded on both sides; so are zero-norm
        // (empty-payload) features — their cosine is NaN against
        // everything, which row_number(desc) would rank FIRST (the IVF
        // operators' cell -1 rule, applied here at the query level)
        .filter(col("feature").isNotNull &&
          exists(col("feature"), v => v =!= lit(0.0)))
      Similarity.bruteForceTopK(feats, feats.filter(col("media_id") < 6),
        "media_id", "feature", 3)
    }),

    // ---- multimodal: dispatch-route audit (r14 verdict task 5) —
    // fences the documented stubDecode `???` boundary OUTSIDE the
    // gated surface: every payload of every gated media fixture
    // family must route to a real codec (the oracle pins the exact
    // per-(src, kind, route) counts as a pure doc_id/text function,
    // so a single fixture falling through to the stub reds this row)
    "mm10_dispatch_audit" -> ((s, dir) => {
      // r15 optimization: same one-file-input fan-out as mm4/mm5 — the
      // audit re-encodes all three fixture families, and without the
      // repartition that entire codec stage runs as one task
      val docs = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val m = graft.testing.MediaFixtures
      val cols = Seq(col("media_id"), col("kind"), col("payload"))
      val all = m.syntheticMedia(docs).select(cols: _*)
        .withColumn("src", lit("synthetic"))
        .unionByName(m.mjpegMedia(docs).select(cols: _*)
          .withColumn("src", lit("mjpeg")))
        .unionByName(m.colorJpegMedia(docs).select(cols: _*)
          .withColumn("src", lit("colorjpeg")))
      Multimodal.dispatchAudit(all)
    }),

    // ---- benchmark decontamination: corpus docs sharing any word
    // 5-gram with the (broadcast) benchmark suite, with overlap counts
    // (long grams, GPT-3/Pile style — short ones false-positive)
    "d8_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.contaminationOverlap(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 5)
    }),

    // ---- end-to-end decontamination: the surviving corpus after the
    // broadcast probe + anti-join (the d8 overlap feeds the drop set)
    "d8b_decontaminated" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.decontaminate(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 5).select(col("doc_id"), col("n_chars"))
    }),

    // ---- line-level boilerplate removal (RefinedWeb line-wise
    // filtering): corpus text carries no newlines, so line structure
    // is synthesized deterministically (8-word lines — the tx6 PII
    // pattern); lines in >= 2 distinct docs are boilerplate and are
    // struck from every doc, survivors reassemble in order
    "d14_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val words = split(col("text"), " ")
      val nl = floor((size(words) + lit(7)) / lit(8)).cast("int")
      val lined = docs.select(col("doc_id"),
        concat_ws("\n", transform(sequence(lit(0), nl - 1),
          i => concat_ws(" ", slice(words, i * 8 + 1, lit(8))))).as("text"))
      Curation.lineDedup(lined, "doc_id", "text", minDf = 2)
    }),

    // ---- CCNet-style perplexity bucketing: bucketed-bigram LM score
    // (literal stub weight table) + per-language head/middle/tail
    // discrete-quantile split
    "tx10_perplexity_buckets" -> ((s, dir) =>
      Curation.perplexityBuckets(t(s, dir, "documents"),
        "doc_id", "text", "lang", perplexityStubWeights)),

    // ---- Bloom-filter decontamination: the scale path — the bench
    // suite folded into a fixed-size bitset (2^20 bits = 128 KiB, 4
    // probes: <1e-4 FP at sf0.1's ~17k bench grams), the corpus side
    // a narrow codegen'd constant-time filter
    "d8c_bloom_decontaminated" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.bloomDecontaminate(
        docs.filter(col("doc_id") % 37 =!= 0),
        docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 5, mBits = BloomM, k = 4)
        .select(col("doc_id"), col("n_chars"))
    }),

    // ---- inter-source near-dup overlap matrix: verified MinHash
    // pairs rolled up by unordered source pair — the duplication-
    // between-ingest-sources report that informs mixture weights
    "st3_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlapMatrix(t(s, dir, "documents"),
        "doc_id", "text", "source", n = 3, numHashes = 16, bands = 4,
        threshold = 0.5)),

    // ---- vocabulary overlap by sketch SET ALGEBRA: per-source bigram
    // distinct sketches from one fused scan; |A∪B| by state merge,
    // |A∩B| by inclusion-exclusion — gate sits in the exact tier so
    // every count is integer-equal to DuckDB's DISTINCT arithmetic
    "st10_vocab_overlap" -> ((s, dir) =>
      Curation.vocabOverlap(t(s, dir, "documents"), "source", "text", n = 2)),

    // ---- mergeable quantile sketch (KLL-style deterministic
    // compactors, TypedImperativeAggregate): gate scale sits inside
    // the sketch's exact tier (n <= k, no compaction), so the oracle
    // can demand the exact lower quantile; above capacity the sketch
    // degrades to a bounded-rank-error estimate (unit-tested)
    "st4_quantile_sketch" -> ((s, dir) =>
      t(s, dir, "documents").groupBy(col("lang")).agg(
        graft.functions.QuantileSketch.quantileSketch(col("n_chars"), 0.5).as("p50"),
        graft.functions.QuantileSketch.quantileSketch(col("n_chars"), 0.9).as("p90"),
        count(lit(1)).as("n_docs"))),

    // ---- z-order layout key: shift-quantized bit interleave of two
    // scan-predicate columns (the min/max-pruning layout for 100 TB
    // parquet); the key arithmetic is the gated surface — the physical
    // rewrite (range partition + sort) is covered by LayoutSpec
    "z1_zorder_key" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ranges = Layout.measureRanges(li, Seq("l_partkey", "l_suppkey"))
      val zc = ranges.map { case (c, lo, hi) => Layout.ZCol(col(c), lo, hi) }
      li.select(col("l_orderkey"), col("l_linenumber"),
        Layout.quantize(zc(0), 8).as("qp"), Layout.quantize(zc(1), 8).as("qs"),
        Layout.zValue(zc, 8).as("z"))
    }),

    // ---- partition-scoped upsert: corrections + late additions land
    // in a source-partitioned corpus; only the touched partition is
    // read/merged/rewritten (dynamic partition overwrite — the
    // untouched-partitions-byte-identical property is pinned by
    // LayoutSpec); result read back from disk vs the merge oracle
    "z2_partition_upsert" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = scopedTmp("graft_upsert", dir)
      docs.write.mode("overwrite").partitionBy("source").parquet(root)
      val updates = docs
        .filter(col("source") === "src1" && col("doc_id") % 2 === 0)
        .withColumn("text", concat(col("text"), lit(" [v2]")))
        .unionByName(docs
          .filter(col("source") === "src1" && col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L)
          .withColumn("text", concat(col("text"), lit(" [new]"))))
      Layout.upsertPartitioned(s, root, updates, "doc_id", "source")
      s.read.parquet(root).select(col("doc_id"), col("source"), col("n_chars"),
        length(col("text")).as("text_len"))
    }),

    // ---- small-file compaction: a fragmented source-partitioned
    // corpus (6 files per partition) compacts to one file per touched
    // partition; content must round-trip exactly (file-count and
    // untouched-partition properties pinned by LayoutSpec)
    // ---- footer-stats audit: write bucket-partitioned files, read
    // row counts + column min/max from parquet FOOTERS only (no data
    // pages), roll up per bucket — must equal the content aggregate,
    // proving the metadata the engine's skipping relies on is truthful
    "z4_file_stats" -> ((s, dir) => {
      val root = scopedTmp("graft_fstats", dir)
      // r15 optimization (§2.3/§6, the z7 projection): the audit reads
      // only per-bucket n_rows + l_orderkey footer intervals — both
      // pure functions of (l_orderkey, bucket); writing the other 15
      // lineitem columns changed no output bit.
      t(s, dir, "lineitem").select(col("l_orderkey"))
        .withColumn("bucket", pmod(col("l_orderkey"), lit(4)))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(root)
      graft.pipeline.Layout.fileStats(s, root, "l_orderkey",
          requirePathToken = "bucket=")
        .withColumn("bucket", regexp_extract(col("file"), "bucket=(\\d+)", 1).cast("long"))
        .groupBy(col("bucket"))
        .agg(sum(col("n_rows")).as("n_rows"),
          min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
    }),

    // ---- compaction plan from FOOTERS ONLY: bucket units largest-
    // first, running row count cut into target-sized bins — one rewrite
    // job per grp. Footer stats are collapsed per bucket token before
    // the bin arithmetic (bucketStats), so the plan is invariant to how
    // many physical files an environment writes per bucket and replays
    // from the logical table; tie order rides min_v, never filenames
    "z6_compaction_plan" -> ((s, dir) => {
      // scratch prefix UNIQUE to this entry: r9's one red row traced to
      // z6 and z3 sharing "graft_compact" — any interleaving that let
      // this fileStats list z3's source=* layout shifted the bin
      // arithmetic while keeping 3 rows (rows/schema green, hash red)
      val root = scopedTmp("graft_z6compact", dir)
      val li = t(s, dir, "lineitem")
      // r15 optimization (§2.3/§6, the z7 projection): the compaction
      // plan consumes only per-bucket n_rows + l_orderkey footer
      // intervals — both pure functions of (l_orderkey, bucket), so
      // auditing a 2-column projection writes ~10× fewer bytes for a
      // bit-identical result (n_rows per bucket is row membership, not
      // row width).
      li.select(col("l_orderkey"))
        .withColumn("bucket", pmod(col("l_orderkey"), lit(8)))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(root)
      // SPLIT-INVARIANT plan input (r10 verdict): per-FILE bin packing is
      // environment-dependent — a conf that splits one bucket into two
      // files (maxRecordsPerFile, AQE) keeps Σ-rows green while shifting
      // the largest-first cut, the exact shape of the r9/r10 driver-only
      // hash-reds. Collapsing footer stats to one row per bucket token
      // makes the plan a pure function of the logical table (what the
      // oracle replays), whatever the physical file count.
      val perBucket = graft.pipeline.Layout.bucketStats(
        graft.pipeline.Layout.fileStats(s, root, "l_orderkey",
          requirePathToken = "bucket="))
      // loud invariants: exactly the 8 bucket tokens just written, no
      // unparsed path, and footer rows covering EXACTLY the table — Σ
      // n_rows is footer metadata, count() is pushed-down parquet
      // metadata, both KB-scale at any corpus size
      val chk = perBucket.agg(
        count(lit(1)), count(col("bucket")), sum(col("n_rows"))).head
      require(chk.getLong(0) == 8 && chk.getLong(1) == 8,
        s"z6: expected 8 bucket= units, saw ${chk.getLong(0)} " +
          s"(${chk.getLong(1)} parsable) — foreign/stale layout under $root")
      val expect = li.count()
      require(chk.getLong(2) == expect,
        s"z6: footer rows ${chk.getLong(2)} != table count $expect — stale/foreign files under $root")
      graft.pipeline.Layout.compactionPlan(perBucket,
          targetRows = 20000L, tieCol = "min_v")
        .groupBy("grp")
        .agg(count(lit(1)).as("n_files"), sum("n_rows").as("total_rows"),
          min("min_v").as("min_v"))
    }),

    // ---- data-skipping effectiveness from FOOTERS ONLY: the same
    // table written hash-bucketed vs range-clustered, then per probe
    // the candidate-file count a `key = probe` scan must read — the
    // measured proof that clustering separates footer intervals
    // (hash ~0 skipped, range ~7/8) before a layout is trusted at
    // scale. Deterministic buckets so the oracle replays the
    // per-file min/max from the logical table
    "z7_skipping_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val mx = li.agg(max(col("l_orderkey"))).head.getLong(0)
      // distinct: on a tiny key domain the integer probe formula can
      // collide, and a duplicated probe would double-count every file
      val probes = (0 until 8).map(i => mx * (2L * i + 1) / 16).distinct
      def audited(frame: org.apache.spark.sql.DataFrame, name: String) = {
        val root = scopedTmp(s"graft_skip_$name", dir)
        frame.repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(root)
        // per-BUCKET candidate units (bucketStats): a physical file
        // split must not change n_files/n_candidates — the oracle
        // replays per-bucket intervals from the logical table (z6 note)
        graft.pipeline.Layout.skippingEffectiveness(
            graft.pipeline.Layout.bucketStats(
              graft.pipeline.Layout.fileStats(s, root, "l_orderkey",
                requirePathToken = "bucket=")), probes)
          .withColumn("layout", lit(name))
      }
      // r15 optimization (§2.3/§6 — write fewer bytes): the audit
      // consumes ONLY the l_orderkey footer interval per bucket
      // directory (fileStats column + bucketStats token) — every other
      // lineitem column was written twice and read never. Projecting
      // the audited table to (l_orderkey, bucket) leaves n_files /
      // n_candidates / skip_milli bit-identical (bucket membership and
      // per-bucket key intervals are pure functions of these two
      // columns) and cuts the two layout writes ~10×.
      val key = li.select(col("l_orderkey"))
      val hash = key.withColumn("bucket", pmod(col("l_orderkey"), lit(8)))
      val range = key.withColumn("bucket",
        least(lit(7L), expr(s"l_orderkey * 8 div ${mx + 1}L")))
      audited(hash, "hash").unionByName(audited(range, "range"))
        .select(col("layout"), col("probe"), col("n_files"),
          col("n_candidates"), col("skip_milli"))
    }),

    // ---- the z-order PAYOFF measured: the same table range-bucketed
    // on ONE column vs on the interleaved z-value, audited with z7's
    // footer machinery on BOTH columns — linear sorting skips only on
    // its own column; the z-layout trades a little of that for real
    // skipping on both. Deterministic buckets replay from the logical
    // table in the oracle
    "z8_zorder_skipping" -> ((s, dir) => z8Audit(s, dir)),

    // ---- the advisor CONSUMING z8's measurements: weighted column
    // workload (60% partkey probes, 40% suppkey) → per-layout score
    // from the measured skip rates → the sort-key decision, flagged
    // on the winner. Metadata arithmetic only (the d3d tuner shape)
    "z9_layout_advisor" -> ((s, dir) =>
      graft.pipeline.Layout.layoutAdvisor(z8Audit(s, dir),
        Map("l_partkey" -> 600L, "l_suppkey" -> 400L))),

    // ---- partition-skew audit from FOOTERS ONLY: per-partition row
    // counts via KB-sized metadata reads (never a data scan), hot
    // partitions flagged at >1.5x the mean by integer
    // cross-multiplication — the "which partition will straggle"
    // check run before launching a job over a layout
    "z5_partition_skew" -> ((s, dir) => {
      val root = scopedTmp("graft_skew", dir)
      // r15 optimization (§2.3/§6, the z7 projection): the skew audit
      // consumes only per-bucket n_rows (fileStats still needs the
      // stats column present — keep l_orderkey, drop the other 15).
      t(s, dir, "lineitem").select(col("l_orderkey"))
        .withColumn("bucket", least(pmod(col("l_orderkey"), lit(8)), lit(3)))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(root)
      val perPart = graft.pipeline.Layout.fileStats(s, root, "l_orderkey",
          requirePathToken = "bucket=")
        .withColumn("bucket",
          regexp_extract(col("file"), "bucket=(\\d+)", 1).cast("long"))
        .groupBy(col("bucket")).agg(sum(col("n_rows")).as("n_rows"))
      val tot = perPart.agg(sum("n_rows").as("_tot"), count(lit(1)).as("_np"))
      perPart.crossJoin(tot)
        .select(col("bucket"), col("n_rows"),
          (col("n_rows") * col("_np") * 10L > col("_tot") * 15L).as("skewed"))
    }),

    "z3_compacted_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = scopedTmp("graft_compact", dir)
      docs.repartition(6).write.mode("overwrite").partitionBy("source").parquet(root)
      Layout.compactPartitions(s, root, "source", maxFiles = 1)
      s.read.parquet(root).select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // ---- bucketed co-located join: both fact tables written bucketed
    // on the join key, so the sort-merge join itself runs with ZERO
    // exchange (plan-audited); the only shuffle left is the final
    // small-key aggregation — the write-once-join-nightly layout
    "b1_bucketed_join" -> ((s, dir) => {
      // cross-run cached layout (write-once-join-nightly): the bucketed
      // write is the ONE-TIME cost this layout exists to amortize, so
      // the entry pays it only when the scoped root is absent — r12
      // verdict task 4: b1's per-run variance was the rewrite's write
      // I/O, not the (exchange-free) join being measured
      val root = scopedTmp("graft_b1", dir)
      def mtime(name: String) = new java.io.File(s"$dir/$name.parquet").lastModified()
      val li = Layout.bucketedTableCached(s,
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        scopedName("graft_b1_lineitem", dir), "l_orderkey", 16, s"$root/lineitem",
        sourceMtime = mtime("lineitem"))
      val ord = Layout.bucketedTableCached(s,
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        scopedName("graft_b1_orders", dir), "o_orderkey", 16, s"$root/orders",
        sourceMtime = mtime("orders"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- PII detection + redaction (emails/phones synthesized onto
    // the corpus deterministically — the raw corpus carries none)
    "tx6_pii_redact" -> ((s, dir) => {
      val pii = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.com or call +1 555 "),
        (col("doc_id") % 9000 + 1000).cast("string"))
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.emailCount(pii).as("n_emails"),
        TextFunctions.phoneCount(pii).as("n_phones"),
        TextFunctions.redactPii(pii).as("redacted"))
    }),

    // ---- deterministic 10% hash sample (stratified by construction)
    "p1_hash_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(Curation.hashSample("doc_id", 10))
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // ---- concat-and-chunk sequence packing into 512-token context
    // windows, per hash shard (the distributed pretraining layout)
    // ---- length-bucketed inference batching + padding-waste audit:
    // the INFERENCE layout complement to p2's training packing
    "p19_length_batches" -> ((s, dir) =>
      Curation.lengthBucketedBatches(t(s, dir, "documents"), "doc_id", "text",
        maxTokensPerBatch = 4096, shards = 8, minBucketLen = 16)),
    "p19b_padding_waste" -> ((s, dir) =>
      Curation.paddingWasteReport(
        Curation.lengthBucketedBatches(t(s, dir, "documents"), "doc_id", "text",
          maxTokensPerBatch = 4096, shards = 8, minBucketLen = 16))),

    "p2_token_pack" -> ((s, dir) =>
      Curation.packChunks(t(s, dir, "documents"), "doc_id", "text",
        ctxTokens = 512, shards = 8)),

    // ---- data-mixture construction: per-language sampling rates on
    // the deterministic hash (en 50%, de 20%, fr 10%, rest 5%)
    "p3_mixture_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(Curation.mixtureSample("doc_id", "lang",
          Map("en" -> 50, "de" -> 20, "fr" -> 10), defaultPct = 5))
        .select(col("doc_id"), col("lang"))),

    // ---- token-budget mixture: per-source keep rates derived from
    // the corpus's own token totals (budget in TOKENS, the unit
    // pretraining mixtures are specified in), per-mille hash gate
    // ---- temperature mixture (α = 1/2): keep rates ∝ 1/√n_s
    // normalized to the token budget — integer-isqrt-quantized so the
    // per-mille gate is portable exactly
    "p15_temperature_mix" -> ((s, dir) =>
      Curation.temperatureMixSample(t(s, dir, "documents"),
        "doc_id", "source", "text", budget = 3000L)
        .select(col("doc_id"), col("source"))),

    // ---- p15 with SKEWED strata (mutation g015: flipping the
    // per-stratum rate dispatch `=== s` to `=!=` survived — the
    // driver corpus' sources carry near-equal token masses, so every
    // stratum's per-mille rate tied and the scramble was invisible).
    // doc_id % 10 carves 7:2:1 strata -> distinct isqrt masses ->
    // distinct rates, and a scrambled dispatch changes the sample.
    "p15b_temperature_mix_skew" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("stratum",
        when(col("doc_id") % 10 < 7, lit("big"))
          .when(col("doc_id") % 10 < 9, lit("mid"))
          .otherwise(lit("small")))
      Curation.temperatureMixSample(docs, "doc_id", "stratum", "text",
        budget = 12000L)
        .select(col("doc_id"), col("stratum"))
    }),

    // ---- exact-size stratified sample: proportional integer quotas
    // per source, filled by each stratum's deterministic bottom-k —
    // returns exactly Σ quotas rows, unlike the rate-based gates
    "p18_stratified_quota" -> ((s, dir) =>
      Curation.stratifiedQuotaSample(t(s, dir, "documents"),
        "doc_id", "source", totalK = 400)),

    // ---- fixed-SIZE per-source sample (vs the rate-based gates): the
    // k smallest (polyHash(id), id) per source via a bounded mergeable
    // heap aggregate — O(k) state per partial, no per-group full sort;
    // rank is the deterministic (hash, id) order
    "p17_bottomk_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(graft.functions.BottomKSample.bottomKSample(col("doc_id"), 20).as("_ids"))
        .select(col("source"), posexplode(col("_ids")))
        .select(col("source"), (col("pos") + 1).as("rank"), col("col").as("doc_id"))),

    "p11_token_budget" -> ((s, dir) =>
      Curation.tokenBudgetSample(t(s, dir, "documents"),
        "doc_id", "source", "text",
        // mixed regimes on the synthetic corpus: src2 far under budget
        // (keeps all), src0/src1 sampled at distinct rates, the rest
        // on the default — scale-factor-dependent rates by design
        Map("src0" -> 800L, "src1" -> 400L, "src2" -> 1000000L),
        defaultBudget = 600L)
        .select(col("doc_id"), col("source"))),

    // ---- mixture upsampling: rates above 100% emit whole copies plus
    // a hash-gated extra — deterministic multi-epoch replication
    "p4_upsample" -> ((s, dir) =>
      Curation.upsample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        Map("en" -> 250, "de" -> 150, "fr" -> 100), defaultPct = 50)),

    // ---- deterministic epoch shuffle: reproducible training order
    // (epoch-salted hash), per-shard positions — no global sort
    "p5_shuffle_order" -> ((s, dir) =>
      Curation.shuffleOrder(t(s, dir, "documents"), "doc_id",
        epoch = 2, shards = 8)),

    // ---- dataset card: the one-row corpus sign-off sheet — mass,
    // diversity, dup share, exact discrete token-length quantiles
    "p27_corpus_card" -> ((s, dir) =>
      Curation.corpusCard(t(s, dir, "documents"), "doc_id", "text",
        "lang", "source")),

    // ---- annealed mixture schedule: per-epoch weights interpolating
    // from the natural token shares (epoch 0) to the curated target
    // mix (last epoch) — the mixture curriculum p25's static plan is
    // the endpoint of
    "p28_mixture_schedule" -> ((s, dir) =>
      Curation.mixtureSchedule(t(s, dir, "documents"), "lang", "text",
        epochs = 4, budgetPerEpoch = 100000L,
        Map("en" -> 500L, "de" -> 200L, "fr" -> 200L, "zh" -> 100L))),

    // ---- curriculum training order: easy→hard per shard (difficulty
    // = coarse length bucket here), epoch-seeded reshuffle WITHIN each
    // difficulty level, stable shard placement across epochs
    "p26_curriculum" -> ((s, dir) =>
      Curation.curriculumOrder(
        t(s, dir, "documents")
          .withColumn("difficulty", expr("n_chars div 50")),
        "doc_id", "difficulty", epoch = 1, shards = 8)),

    // ---- Gopher-style quality filter: word-count / mean-word-length /
    // distinct-fraction / stopword-count rules, keep flag — all narrow
    "tx7_gopher_filter" -> ((s, dir) =>
      Curation.gopherFilter(t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text").drop("text")),

    // ---- distributed k-means (1 Lloyd iteration, hash-seeded):
    // narrow argmax assignment over a driver-collected quantizer —
    // zero Exchange to get a cell, one (cell, dim) shuffle per round
    "c1_kmeans" -> ((s, dir) =>
      Clustering.kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 1)),

    // ---- multi-round Lloyd: the ITERATIVE path (refit → reassign →
    // refit → final assign) gated end-to-end — each round is one
    // (cell, dim) integer-partial shuffle, assignment stays narrow
    "c1b_kmeans_iter2" -> ((s, dir) =>
      Clustering.kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2)),

    // ---- cluster label purity: per-cell majority-label share over the
    // k-means assignment — the cluster-quality companion to s11
    // ---- centroid-distance outliers: vectors whose cosine to their
    // OWN assigned centroid is under threshold (likely noise /
    // mislabeled) — narrow end to end, quantizer rides as literals
    "c6_centroid_outliers" -> ((s, dir) =>
      graft.pipeline.Clustering.centroidOutliers(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        StubQuantizer.cents.toSeq, threshold = 0.08)),

    // ---- all-integer assignment-margin audit (silhouette-style
    // "is k right"): best vs second-best exact integer dot scores
    // against normalized-quantized centroid literals; margins crowd
    // zero exactly where clusters overlap. One narrow scoring
    // projection, one metadata-cell exchange
    "c7_assignment_margin" -> ((s, dir) =>
      graft.pipeline.Clustering.assignmentMargin(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        StubQuantizer.qcents)),

    // ---- PageRank over the page-transition graph: consecutive events
    // per user edge prev→next on the page id (props.k), weighted by
    // count; 3 power-method steps, dangling mass redistributed — one
    // co-partitioned hash join + one partial-agg'd shuffle per step,
    // scalars (|V|, dangling mass) ride as 1-row frames, no collect
    "g1_pagerank" -> ((s, dir) => {
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      graft.pipeline.GraphOps.pageRank(edges, iters = 3)
    }),

    // ---- personalized (topic-sensitive) PageRank: teleport and
    // dangling mass return to the seed pages 0-9 only — proximity-to-
    // trusted-set scoring; same per-step plan shape as g1
    "g2_personalized_pagerank" -> ((s, dir) => {
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      graft.pipeline.GraphOps.personalizedPageRank(
        edges, s.range(0, 10).toDF("id"), iters = 3)
    }),

    // ---- HITS hubs & authorities over the same transition graph:
    // the directional complement to g1 (hub/content split); two
    // mutual-reinforcement steps, L1-normalized in-plan
    "g3_hits" -> ((s, dir) => {
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      graft.pipeline.GraphOps.hits(edges, iters = 2)
    }),

    // ---- community detection: 3 synchronous label-propagation rounds
    // over the (undirected) transition graph — deterministic variant
    // (min-label ties), exact integer neighbor mass
    "g4_label_propagation" -> ((s, dir) => {
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      graft.pipeline.GraphOps.labelPropagation(edges, iters = 3)
    }),

    // ---- modularity of the LPA partition: per-community Newman Q
    // contributions in exact integer cross-form — "did community
    // detection find real structure" (Q≈0 = no better than random
    // wiring), the quality gate run before trusting g4's groups.
    // The singleton partition rides alongside as the contrast: its
    // strictly negative Q is the score a structureless assignment
    // earns, so the row demonstrates the verdict discriminates
    "g8_modularity" -> ((s, dir) => {
      // persisted: FOUR consumers re-derive the events-scan + user-window
      // lineage otherwise (LPA, both modularity calls, the singleton ids)
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ONE undirected view for all three consumers (r16 §2.4): LPA's
      // internal build, modularityMulti's, and the singleton id set
      // each rebuilt the same corpus-scale exchange from `edges`
      val und = graft.pipeline.GraphOps.undirectedWeighted(edges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val singletons = und.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
      // ONE modularityMulti pass: the undirected build, per-node
      // degrees and W2 are partition-independent — two separate
      // modularity() calls rebuilt all three (r11 bench cut)
      graft.pipeline.GraphOps.modularityMulti(edges, Seq(
        "lpa" -> graft.pipeline.GraphOps.labelPropagation(
          edges, iters = 3, undirected = Some(und)),
        "singletons" -> singletons),
        undirected = Some(und))
    }),

    // ---- exact triangles by degree-ordered orientation: out-degrees
    // bounded O(sqrt m) so wedge enumeration survives power-law hubs;
    // three equi-joins, one keyed count, each triangle found once
    "g5_triangles" -> ((s, dir) => {
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      graft.pipeline.GraphOps.triangleCount(edges)
    }),

    // ---- bounded k-core peeling: 3 rounds of drop-degree-<3 over the
    // transition graph — the density skeleton degree alone cannot see
    // (star centers die when their leaves go); survivors carry their
    // subgraph degree
    "g6_kcore" -> ((s, dir) => {
      val edges = graft.pipeline.GraphOps.transitionEdges(
        t(s, dir, "events"), "user_id",
        get_json_object(col("props"), "$.k"), "ts", tieCols = Seq("event_id"))
      graft.pipeline.GraphOps.kCore(edges, k = 3, rounds = 3)
    }),

    "c5_cluster_purity" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Clustering.clusterLabelPurity(
        Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 1),
        emb.select(col("vec_id"), col("label")), "vec_id", "label")
    }),

    // ---- SemDeDup semantic dedup: same-cell pair pruning only —
    // the candidate set is Σ|cell|², never corpus all-pairs
    "c2_semantic_dedup" -> ((s, dir) =>
      Clustering.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, threshold = 0.4, iters = 1)),

    // ---- cross-corpus SEMANTIC decontamination: drop training
    // vectors within 0.4 cosine of any eval vector — the
    // embedding-space complement to d8's n-gram decontamination
    // (catches paraphrased leakage); eval side broadcast, same-cell
    // candidates only
    "c8_semantic_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Clustering.semanticDecontaminate(
        emb.filter(col("vec_id") % 23 =!= 0),
        emb.filter(col("vec_id") % 23 === 0),
        "vec_id", "embedding", k = 8, threshold = 0.4, iters = 1)
    }),

    // ---- corpus composition report: ROLLUP over (lang, source) with
    // doc/token/char totals — one partial-agg'd exchange
    "st1_corpus_stats" -> ((s, dir) =>
      Curation.corpusStats(t(s, dir, "documents"), Seq("lang", "source"), "text")),

    // ---- top-3 salient terms per doc by tf·(N/df) — the rational-idf
    // tf-idf family (exact cross-engine arithmetic, no libm ln)
    "tx8_tfidf" -> ((s, dir) =>
      Curation.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)),

    // ---- corpus collocations: adjacent-pair association (rational
    // PMI inside — integer products, engine-portable), pairs pruned by
    // the integer count threshold BEFORE the vocabulary joins
    "tx16_collocations" -> ((s, dir) =>
      Curation.collocations(t(s, dir, "documents"), "text", minCount = 5)),

    // ---- vocabulary coverage / OOV audit: per-source token totals
    // and in-vocab counts against a literal vocabulary — a narrow
    // per-row membership fold, one stratum exchange, text never moves
    "tx17_vocab_coverage" -> ((s, dir) =>
      Curation.vocabCoverage(t(s, dir, "documents"), Seq("source"), "text",
        Seq("the", "a", "of", "to", "and", "scan", "column", "window",
          "sort", "value", "query", "merge"))),

    // ---- Gopher repetition signal: most frequent word bigram per doc
    // + the character fraction its occurrences cover — catches
    // templated spam that the distinct-word fraction (tx5) misses
    "tx18_top_ngram" -> ((s, dir) =>
      Curation.topNgramFraction(t(s, dir, "documents"), "doc_id", "text")),

    // ---- Gopher duplicate-n-gram coverage (the union-of-windows
    // `duplicate_ngram_chars_fraction` family, n=3 and n=5): word
    // positions + char mass inside ANY repeated n-gram occurrence —
    // the many-different-repeated-phrases signal tx18's single top
    // gram cannot see
    "tx22_dup_ngram_coverage" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Curation.dupNgramCoverage(d, "doc_id", "text", 3)
        .unionByName(Curation.dupNgramCoverage(d, "doc_id", "text", 5))
    }),

    // ---- per-source boilerplate-line report: text is deterministically
    // pre-lined into 8-word blocks (the d14 convention) and each doc
    // gets its source's synthetic template header prepended (the
    // corpus is random words — organic 8-word-block repeats are rare,
    // so the site-template shape the detector exists for is injected,
    // the tx19/tx20 pattern); report = lines in >= 10% of a source's
    // docs
    "tx24_boilerplate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("text").isNotNull)
      val words = split(col("text"), " ")
      val nl = floor((size(words) + lit(7)) / lit(8)).cast("int")
      val lined = docs.select(col("doc_id"), col("source"),
        concat(
          concat(col("source"), lit(" site banner cookie notice nav")),
          lit("\n"),
          concat_ws("\n", transform(sequence(lit(0), nl - 1),
            i => concat_ws(" ", slice(words, i * 8 + 1, lit(8)))))).as("text"))
      Curation.boilerplateReport(lined, "doc_id", "text", "source",
        minDf = 2, minShareMilli = 100)
    }),

    // ---- Heaps-law vocabulary growth: cumulative type count vs token
    // mass at 10 id-range checkpoints — the "is more data adding
    // vocabulary?" curve read before training a tokenizer on a bigger
    // crawl
    "tx25_vocab_growth" -> ((s, dir) =>
      Curation.vocabGrowth(t(s, dir, "documents"), "doc_id", "text", 10)),

    // ---- Zipf rank-frequency audit: top-20 tokens with rank·count
    // products — the corpus-naturalness check (head-heavy = template
    // spam, flat = shuffled junk)
    "tx26_zipf" -> ((s, dir) =>
      Curation.zipfAudit(t(s, dir, "documents"), "text", 20)),

    // ---- Unicode NFC normalization audit over a deterministically
    // decomposed copy (combining acute injected after every 'e' — the
    // corpus is ASCII, so the raw audit would be vacuous): changed
    // flag + normalized length + MD5 of the composed text, pinning
    // graft_nfc against DuckDB's nfc_normalize
    "tx19_nfc_audit" -> ((s, dir) =>
      Curation.nfcAudit(
        t(s, dir, "documents").withColumn("text",
          regexp_replace(col("text"), "e", "e\u0301")),
        "doc_id", "text")),

    // ---- Unicode script profile over a deterministically
    // transliterated copy (Cyrillic/Greek/CJK injected for common
    // letters — the ASCII corpus would make the audit vacuous):
    // per-block codepoint counts + priority-CASE dominant label
    "tx20_script_profile" -> ((s, dir) =>
      Curation.scriptProfile(
        t(s, dir, "documents").withColumn("text",
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            "o", "\u043e"), "i", "\u03b9"), "u", "\u4e2d")),
        "doc_id", "text")),

    // ---- lang-ID × script cross-audit over the same transliterated
    // copy: cells where the two independent signals disagree (en by
    // stopwords, cyrillic by codepoints) are the wrong-decoder /
    // transliteration-spam docs each signal alone scores as plausible
    // injection class keeps the English function words (the/a/of/to/
    // and) intact so lang-ID stays confident while the letter MASS
    // goes Cyrillic — the homoglyph-spam shape the audit exists for
    "tx23_lang_script_mismatch" -> ((s, dir) =>
      Curation.langScriptAudit(
        t(s, dir, "documents").withColumn("text",
          regexp_replace(col("text"), "[bcgijklmprsuvwyz]", "ж")),
        "doc_id", "text")),

    // ---- markup extraction: each doc is deterministically wrapped in
    // an HTML page (script/style/comment blocks, entities, per-word
    // <p> tags) and stripMarkup must recover the text — the tx5
    // round-trip pattern for the WARC→WET extraction step
    "tx12_markup_extract" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><head><title>t</title><script type=\"text/javascript\">var x = 1 && 2;</script>" +
          "<style>p { color: red; }</style></head><!-- nav --><body><h1>"),
        col("source"), lit("</h1><p>"),
        regexp_replace(col("text"), " ", "</p> <p>"),
        lit("</p><div class=\"ft\">&amp;copy; 2026 &lt;corp&gt;&nbsp;&#39;end&#39;</div></body></html>"))
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.stripMarkup(html).as("extracted"))
    }),

    // ---- encoding-damage report + mojibake repair: docs are
    // deterministically corrupted in-query (the tx12 wrap pattern) —
    // %7==0 mojibake'd (e → Ã©), %7==1 replacement chars appended,
    // %7==2 control chars added — then the detector counts each class
    // and graft_fix_mojibake must exactly restore the %7==0 docs to
    // the accented form of the original
    "tx13_encoding_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val moji = "Ã©" // 'é' seen through a Latin-1 decode
      val corrupted = when(col("doc_id") % 7 === 0,
          regexp_replace(col("text"), "e", moji))
        .when(col("doc_id") % 7 === 1, concat(col("text"), lit("��")))
        .when(col("doc_id") % 7 === 2,
          concat(lit("\u0001"), col("text"), lit("\u0007")))
        .otherwise(col("text"))
      val expected = when(col("doc_id") % 7 === 0,
          regexp_replace(col("text"), "e", "é"))
        .otherwise(corrupted)
      docs.select(col("doc_id"), corrupted.as("_c"), expected.as("_x"))
        .select(col("doc_id"),
          regexp_count(col("_c"), lit("�")).as("n_repl"),
          regexp_count(col("_c"), lit(Curation.ControlCharClass)).as("n_ctrl"),
          regexp_count(col("_c"), lit(Curation.MojibakeClass)).as("n_moji"),
          (graft.functions.NativeExpressions.fixMojibake(col("_c")) === col("_x"))
            .as("repaired_ok"))
        .withColumn("keep",
          col("n_repl") === 0 && col("n_ctrl") === 0 && col("n_moji") === 0)
    }),

    // ---- corpus snapshot diff: v_old drops doc_id%10==7, v_new drops
    // %10==3 and rewrites %5==0 docs — added/removed/changed delta;
    // only (id, md5) rows ever shuffle
    "v1_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 10 =!= 7)
      val newSnap = docs.filter(col("doc_id") % 10 =!= 3)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, upper(col("text"))).otherwise(col("text")))
      Curation.snapshotDiff(oldSnap, newSnap, "doc_id", Seq("text", "lang", "source"))
    }),

    // ---- snapshot distribution drift: per-(lang, source) counts +
    // mean length across two snapshots, drift flag by integer share
    // cross-multiplication — one keyed exchange, totals broadcast back
    "v2_profile_drift" -> ((s, dir) => {
      // snapshots = id-range halves (id parity correlates with source in
      // this data); the new snapshot loses 2/3 of src7 — that stratum
      // must flag, the rest must not
      val docs = t(s, dir, "documents")
      val tagged = docs.crossJoin(docs.agg(max("doc_id").as("_mx")))
      Curation.snapshotDrift(
        tagged.filter(col("doc_id") * 2 <= col("_mx")).drop("_mx"),
        tagged.filter(col("doc_id") * 2 > col("_mx"))
          .filter(col("source") =!= "src7" || col("doc_id") % 3 === 0)
          .drop("_mx"),
        Seq("source"), "n_chars", driftPct = 20)
    }),

    // ---- time-sliced mixture drift: per (day, event_type) share vs
    // the overall share, integer cross-multiplication verdict — the
    // "did the source mix wobble over ingestion time" monitor
    "v3_time_share_drift" -> ((s, dir) =>
      Curation.timeSlicedShareDrift(t(s, dir, "events"), "ts",
        Seq("event_type"), bucket = "day", driftPct = 20)),

    // ---- entity-novelty curve: per-day active/new/cumulative
    // distinct (user, type) entities — the temporal Heaps audit ("is
    // the stream still discovering entities?"); saturation vs churn
    "v4_entity_novelty" -> ((s, dir) =>
      graft.operators.EventAnalytics.entityNovelty(
        t(s, dir, "events"), Seq("user_id", "event_type"), "ts")),

    // ---- BM25 ranked retrieval for a literal query-term set: narrow
    // per-row tf folds, one single-row stats broadcast, global top-k
    // via TakeOrderedAndProject (rational idf — no libm ln)
    "tx11_bm25_search" -> ((s, dir) =>
      Curation.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "merge"), k = 10)),

    // ---- hybrid retrieval: BM25 lexical top-20 + cosine vector
    // top-20 fused by reciprocal rank (2^20 div (60+r) — pure integer,
    // no cross-scorer calibration needed because only RANKS fuse)
    "s20_rrf_fusion" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val vecRank = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 7), "vec_id", "embedding", k = 20)
        .select(col("cid").as("id"), col("rank"))
      val bmRank = Curation.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "window", "merge"), k = 20)
        .select(col("doc_id").as("id"), col("rank"))
      Similarity.rrfFuse(Seq(vecRank, bmRank), "id", k = 10)
    }),

    // ---- exact phrase search over a PERSISTED positional inverted
    // index: postings built once (partitioned by term hash bucket),
    // then the query prunes to its terms' partitions and intersects
    // posting lists by (doc, aligned position) — a corpus query that
    // never re-reads the corpus. PlanAuditSpec pins the partition
    // pruning; CurationSpec pins index path == document-local scan path
    "tx14_phrase_search" -> ((s, dir) => {
      val idx = scopedTmp("graft_tx14", dir) + "/idx"
      Curation.buildPhraseIndex(t(s, dir, "documents"), "doc_id", "text", idx)
      // 2-term probe (r11 verdict task 3): ScaleSmoke's sf1 replicas
      // replace every 3rd word with a doc-specific token, so EVERY
      // 3-word window is perturbed and a 3-term phrase gates zero rows
      // at 10× — branch coverage, not evidence. A 2-word phrase
      // starting at position ≡0 (mod 3) survives all replicas
      // (measured: 94 surviving occurrences at sf0.1 → nonzero at
      // sf1), and still exercises the aligned-position intersection
      // (pos_b = pos_a + 1) plus the index partition pruning.
      Curation.phraseSearch(s.read.parquet(idx), "doc_id",
        Seq("big", "order"))
    }),

    // ---- tx14's SCAN-path sibling (mutation g018: phraseHits' exact-
    // length gate `size(toks) >= phrase.size` flipped to `>` survived —
    // phraseHits had no oracle entry and no corpus doc is exactly
    // phrase-length). Every 13th doc's text is replaced with the phrase
    // itself, so the boundary (doc == phrase, one hit at position 1) is
    // load-bearing for ~1/13 of the rows.
    "tx27_phrase_hits" -> ((s, dir) => {
      val feed = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 13 === 0, lit("big order")).otherwise(col("text")))
      feed.select(col("doc_id"),
        Curation.phraseHits(col("text2"), Seq("big", "order")).as("hits"))
    }),

    // ---- cross-corpus dedup: new shard (doc_id % 3 != 0) deduped
    // against the reference shard via MinHash band buckets — survivors
    "d10_cross_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.crossCorpusDedup(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", n = 3, numHashes = 16, bands = 4, threshold = 0.5)
        .select(col("doc_id"), col("n_chars"))
    }),

    // ---- cross-corpus dedup from a PERSISTED reference index: the
    // reference third is shingled/banded once and saved (band-
    // partitioned distinct-signature buckets); the new side dedups
    // against the loaded index — must hash-equal the in-session d10
    "d15_saved_dedup_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = scopedTmp("graft_dedupidx", dir)
      Dedup.saveDedupIndex(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", path, n = 3, numHashes = 16, bands = 4)
      Dedup.crossCorpusDedupWithIndex(
        docs.filter(col("doc_id") % 3 =!= 0),
        Dedup.loadDedupIndex(s, path), "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"), col("n_chars"))
    }),

    // ---- incremental index maintenance: the reference third arrives
    // in TWO shards — the second is appended WITHOUT re-reading the
    // first (band-partition appends; union drop semantics make
    // cross-shard duplicate signatures harmless) — and serving against
    // the grown index must equal the one-shot d10 run
    "d16_index_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = scopedTmp("graft_dedupidx_app", dir)
      Dedup.saveDedupIndex(
        docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0),
        "doc_id", "text", path, n = 3, numHashes = 16, bands = 4)
      Dedup.appendToDedupIndex(
        docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0),
        "doc_id", "text", path)
      Dedup.crossCorpusDedupWithIndex(
        docs.filter(col("doc_id") % 3 =!= 0),
        Dedup.loadDedupIndex(s, path), "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"), col("n_chars"))
    }),

    // ---- DSIR importance weights: target = doc_id % 41 == 0 slice,
    // hashed word-bigram buckets, integer-quantized log-ratios
    // the scoring fold with an embedded literal weight table — the
    // data-fitted table differs only by dsirLogRatios' driver-side ln
    // (excluded from the gate: libm last-ulp, ADVICE r4)
    "p6_dsir_weights" -> ((s, dir) =>
      Curation.dsirScore(
        t(s, dir, "documents").filter(col("doc_id") % 41 =!= 0),
        "doc_id", "text", n = 2, dsirStubWeights)),

    // the integer-exact half of the DSIR fit: per-bucket gram counts
    // for target and corpus sides
    "p6b_dsir_counts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.dsirBucketCounts(
          docs.filter(col("doc_id") % 41 === 0), "text", n = 2, buckets = 1024)
        .withColumn("side", lit("target"))
        .unionByName(Curation.dsirBucketCounts(
            docs.filter(col("doc_id") % 41 =!= 0), "text", n = 2, buckets = 1024)
          .withColumn("side", lit("corpus")))
    }),

    // ---- dedup with retention policy: per simhash near-dup group keep
    // the LONGEST doc (ties → lowest id), not the minimum id
    "d11_dedup_keep_best" -> ((s, dir) =>
      Dedup.nearDupDedupBy(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id",
        Dedup.simhashEdges(t(s, dir, "documents"), "doc_id", "text", maxHamming = 2),
        "n_chars")),

    // ---- deterministic train/val/test split: 90/5/5 over the portable
    // id hash — documents never migrate splits when the corpus grows
    "p7_split" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        Curation.splitAssign("doc_id",
          Seq("train" -> 90, "val" -> 5, "test" -> 5)).as("split"))),

    // ---- RAG chunking: fixed-size overlapping character windows,
    // integer chunk-count arithmetic, narrow generate + substring
    "p14_chunking" -> ((s, dir) =>
      Curation.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
        size = 200, overlap = 50)),

    // ---- END-TO-END curation pipeline: gopher quality filter → exact
    // dedup → benchmark decontamination → split assignment, one
    // composed plan — operators are built to CHAIN, and this row pins
    // the composition (each stage is also gated alone: tx7/d1/d8b/p7)
    "p13_corpus_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 37 === 0)
      val corpus = docs.filter(col("doc_id") % 37 =!= 0)
      val kept = Curation.gopherFilter(corpus.select(col("doc_id"), col("text")), "text")
        .filter(col("keep")).select("doc_id")
      val surviving = corpus.join(kept, "doc_id")
      val deduped = Dedup.exactDedup(surviving, "text", "doc_id")
      val clean = Curation.decontaminate(deduped, bench, "doc_id", "text", n = 5)
      clean.select(col("doc_id"),
        Curation.splitAssign("doc_id",
          Seq("train" -> 90, "val" -> 5, "test" -> 5)).as("split"))
    }),

    // ---- leakage-safe split: hash-stable labels PLUS eval-
    // contamination guard — train docs near-duplicating a test doc
    // (MinHash cross-corpus) are dropped; val/test pass through
    "p12_leakage_split" -> ((s, dir) =>
      Curation.leakageSafeSplit(t(s, dir, "documents"), "doc_id", "text",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select(col("doc_id"), col("split"))),

    // ---- per-language vocabulary heavy hitters: mergeable
    // SpaceSaving aggregate, fixed-size state per (group, partition);
    // gate scale sits inside the sketch's EXACT tier (distinct ≤
    // capacity → no eviction), so the oracle is the exact wordcount
    // top-10 — the st4 QSketch contract, applied to frequency
    "st5_heavy_hitters" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("lang")
        .agg(graft.functions.HeavyHitters.topK(col("token"), 10).as("hh"))
        .select(col("lang"), posexplode(col("hh")).as(Seq("r0", "e")))
        .select(col("lang"), (col("r0") + 1).cast("long").as("rank"),
          col("e.item").as("token"), col("e.count").as("n"))),

    // ---- robust outlier report on the median/MAD scale: one corpus
    // scan to a (group, quantized-value) histogram; median, MAD, and
    // the 3-MAD outlier count are all metadata arithmetic over it —
    // the profile the outliers themselves cannot drag (unlike
    // mean/stddev)
    "st11_mad_outliers" -> ((s, dir) =>
      Curation.robustOutlierReport(t(s, dir, "events"),
        "event_type", "value")),

    // ---- cross-COLUMN Gram over a numeric table: the same one-pass
    // exact integer (n, sums, upper-tri products) buffer as s16, fed
    // a column vector instead of an embedding — covariance/correlation
    // between table columns from ONE scan, the measured input to
    // choosing a z-order / clustering key (columns that co-vary
    // cluster together). Columns pre-scaled into a common range so
    // the checked arithmetic has 100 TB headroom
    "st12_column_gram" -> ((s, dir) =>
      graft.pipeline.Pca.gramTriples(
        t(s, dir, "lineitem").select(array(
          col("l_quantity").cast("double"),
          col("l_extendedprice").cast("double") / 1000.0,
          col("l_discount").cast("double") * 10.0,
          col("l_tax").cast("double") * 10.0).as("v")),
        "v", 4, scaleBits = 6)),

    // ---- single-pass numeric profile of lineitem (ANALYZE-style):
    // one scan, one agg row, narrow stack reshape
    "st2_numeric_profile" -> ((s, dir) =>
      Curation.numericProfile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // ---- the same profile in ONE fused scan: distinct counts ride
    // the nulls/min/max aggregate as mergeable sketches (exact tier at
    // gate scale — count(DISTINCT) oracle applies; ~0.8% HLL above);
    // PlanAuditSpec pins the single-FileScan shape
    // sketchK covers sf0.1's ~150k order keys so the exact tier holds
    // at every oracle-checked SF; sf1+ rides the HLL tier (unchecked
    // here, bounded-error by construction)
    "st2b_profile_sketch" -> ((s, dir) =>
      Curation.numericProfileSketch(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        sketchK = 1 << 18)),

    // ---- count-min point frequencies: the "how often did THIS token
    // occur" sketch under a fixed memory budget — elementwise-additive
    // merges (no tie rules), estimates are exact here because a
    // target over-counts only if some token collides in ALL 4 rows
    // (p ≈ vocab/width⁴); the oracle is the exact count
    "st9_countmin" -> ((s, dir) => {
      val targets = Seq("scan", "column", "window", "sort", "value")
      t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .agg(graft.functions.CountMin.countMinEstimates(col("tok"), targets).as("_est"))
        .select(posexplode(col("_est")))
        .select(element_at(typedLit(targets), (col("pos") + 1).cast("int")).as("token"),
          col("col").as("est_count"))
    }),

    // ---- grouped top-k WITHOUT a window sort: the k best (score, id)
    // per group via a mergeable bounded heap — O(k) partial state,
    // map-side pruning, exact and deterministic (id breaks score
    // ties); the row_number formulation sorts every group's full rows
    "st8_topk_docs" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(graft.functions.TopKBy.topKBy(col("n_chars"), col("doc_id"), 5).as("_top"))
        .select(col("source"), posexplode(col("_top")))
        .select(col("source"), (col("pos") + 1).as("rank"),
          col("col.score").as("n_chars"), col("col.id").as("doc_id"))),

    // ---- incremental profile maintenance: profile the "base" half of
    // lineitem ONCE, persist the mergeable per-column state to parquet,
    // then fold a "delta" half's fresh state on top WITHOUT re-scanning
    // the base — the finalized result must equal the full-scan profile
    // (st2's exact oracle; the sketch exact tier makes merge order
    // immaterial). The 100 TB story: daily stats cost one delta scan
    // plus a metadata-sized merge, never a base re-scan.
    "st7_incremental_profile" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val li = t(s, dir, "lineitem")
      val stateDir = scopedTmp("graft_st7", dir) + "/state"
      Curation.numericProfileState(li.filter(col("l_orderkey") % 2 === 0),
          cols, sketchK = 1 << 18)
        .write.mode("overwrite").parquet(stateDir)
      val baseState = s.read.parquet(stateDir) // round-trip through disk
      val deltaState = Curation.numericProfileState(
        li.filter(col("l_orderkey") % 2 =!= 0), cols, sketchK = 1 << 18)
      Curation.finalizeProfileStates(baseState.unionByName(deltaState))
    }),

    // ---- fastText-style hashed linear classifier: per-doc logit over
    // LCG demo weights + keep decision — narrow, zero shuffle
    "p9_classifier_filter" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Curation.linearClassifierScore(col("text"),
          Curation.lcgWeights(1024), 1024).as("logit"))
        .withColumn("keep", col("logit") > lit(0.0))),

    // ---- learn the first 3 BPE merges from the corpus: one corpus
    // scan to the word-frequency table, then each round is a pair
    // count over the Zipf-bounded vocab + one argmax row to the
    // driver + a codegen'd greedy array-fold merge. The oracle
    // replays the identical rounds with recursive-CTE greedy walks
    // ---- BPE APPLY with a word-INITIAL merge pinned (r13 mutation
    // wave 2: the fold's leftmost-merge rule at word position 1 was
    // unobservable — the corpus's learned merges (er/in/ow) start no
    // word, so an off-by-one in the fold position survived). 'jo' and
    // 'ha' head ~1.9k corpus words; chaining 'joh' exercises a merge
    // whose LEFT side is itself a merged symbol.
    "tx15c_bpe_apply_initial" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        Curation.bpeTokenCount(col("text"),
          Seq("j" -> "o", "h" -> "a", "jo" -> "h")).as("n_bpe"))),

    "tx15_bpe_merges" -> ((s, dir) =>
      Curation.bpeTrainMerges(t(s, dir, "documents"), "text", rounds = 3)),

    // ---- the ENCODE path: learn 3 merges, then tokenize every doc
    // with them — per-doc BPE token counts from a pure narrow fold
    // (merge table as literals, zero joins). Train → apply, composed
    "tx15b_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = Curation.bpeLearn(docs, "text", rounds = 3)
      docs.select(col("doc_id"),
        Curation.bpeTokenCount(col("text"), merges).as("n_bpe"))
    }),

    // ---- reliability diagram for the p9 classifier against the
    // "is English" label: 20 equal-width logit cells over [-30, 10),
    // per-cell row count / positive count / exact quantized-score sum
    // — the calibration audit run before trusting a quality threshold
    "p21_classifier_calibration" -> ((s, dir) =>
      Curation.calibrationReport(
        t(s, dir, "documents").select(col("doc_id"),
          Curation.linearClassifierScore(col("text"),
            Curation.lcgWeights(1024), 1024).as("logit"),
          (col("lang") === "en").as("label")),
        "logit", "label", lo = -30.0, hi = 10.0, buckets = 20)),

    // ---- tokenizer fertility by language: learn the 3 BPE merges,
    // tokenize every doc, roll up per-language token/word/char masses
    // + integer milli-fertility (tokens per word × 1000) — the "is
    // this tokenizer fair to each language" audit run before
    // committing a vocab to a multilingual corpus (a high-fertility
    // language pays more sequence length for the same text). One
    // narrow scoring pass over merge literals, one (lang) exchange of
    // four longs
    "tx21_tokenizer_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = Curation.bpeLearn(docs, "text", rounds = 3)
      docs.select(col("lang"),
          Curation.bpeTokenCount(col("text"), merges).cast("long").as("_bpe"),
          TextFunctions.tokenCount(col("text")).cast("long").as("_w"),
          length(col("text")).cast("long").as("_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("_bpe").as("bpe_tokens"),
          sum("_w").as("words"),
          sum("_chars").as("chars"))
        .withColumn("fertility_milli",
          expr("bpe_tokens * 1000L div words"))
    }),

    // ---- TRAIN the quality classifier (p9 is inference): full-batch
    // logistic regression on hashed token-bucket features, label =
    // "is English". The fixed-point gradient (round(contrib*1e6),
    // exact integer sum) makes the weights bit-reproducible across
    // partition orders AND engines — the oracle replays the identical
    // three GD iterations in SQL and must land on the same doubles
    "p16_classifier_train" -> ((s, dir) =>
      Curation.trainHashedLogreg(t(s, dir, "documents"), "text",
        col("lang") === "en", dims = 8, iters = 3, lr = 0.5)),

    // ---- top-20% quality selection per language (exact windowed cut;
    // ties -> lowest id) over the tx2 quality score
    "p8_quality_select" -> ((s, dir) =>
      Curation.selectTopByStratum(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality")),
        "lang", "quality", "doc_id", keepPct = 20)),

    // ---- domain balancing: at most ~10 docs per source, selected by
    // deterministic hash — the per-domain cap rule, scale path (no
    // per-group window over corpus rows)
    "p10_source_cap" -> ((s, dir) =>
      Curation.capPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", cap = 10)),

    // ---- quality selection, corpus-scale shape: bucketed histogram
    // discrete-quantile threshold + narrow filter (no stratum window
    // over the full table — the path that survives an "en" stratum
    // holding half the corpus)
    "p8b_quality_select_quantile" -> ((s, dir) =>
      Curation.selectAboveQuantile(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality")),
        "lang", "quality", keepPct = 20)),

    // ---- k-anonymity audit: group-size histogram under the
    // (event_type, day, value-band) quasi-identifier combo, sub-k
    // sizes flagged — the re-identification release gate the tx6
    // direct-identifier redaction does not cover
    "p24_k_anonymity" -> ((s, dir) =>
      Curation.kAnonymityAudit(
        t(s, dir, "events").select(
          col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          expr("CAST(CAST(value AS DOUBLE) AS LONG) div 100").as("vb")),
        Seq("event_type", "day", "vb"), k = 5)),

    // ---- epoch/repeat mixture planner: per-language milli-epochs to
    // hit a 2M-token run at the target weights under a 2.5-epoch
    // repeat cap — the static plan (one metadata aggregate) that
    // precedes p6's downsampling and p4's repetition; es carries no
    // weight (plans zero), en exceeds the cap (carries a deficit)
    "p25_mixture_plan" -> ((s, dir) =>
      Curation.mixturePlan(
        t(s, dir, "documents"), "lang", "text",
        budget = 2000000L,
        weightsPm = Map("en" -> 500L, "zh" -> 200L, "de" -> 150L, "fr" -> 100L),
        maxMilliEpochs = 2500L)),

    // ---- Poisson bootstrap of the corpus mean-quality metric: 32
    // deterministic resamples (inverse-CDF Poisson(1) weights from the
    // portable hash), one narrow scan ×32 map-side combined to 32
    // rows — the error bar a corpus metric should carry before a
    // mixture decision acts on it
    "p23_bootstrap_ci" -> ((s, dir) =>
      Curation.bootstrapReplicates(
        t(s, dir, "documents").select(col("doc_id"),
          (TextFunctions.qualityScore(col("text")) * 1048576d)
            .cast("long").as("qm")),
        "doc_id", "qm")),

    // ---- multi-signal consensus filter: exact per-signal global rank
    // recovered from domain-bounded value histograms (no corpus-scale
    // sort anywhere), Borda sum, keep = mean rank percentile <= 20.
    // Signals: composite quality (higher better), punctuation ratio
    // (lower better), token count (higher better) — quantized to the
    // engine-portable trunc(x*2^20) integer grid
    "p20_rank_ensemble" -> ((s, dir) =>
      Curation.rankEnsemble(
        t(s, dir, "documents").select(col("doc_id"),
          (TextFunctions.qualityScore(col("text")) * 1048576.0)
            .cast("long").as("q"),
          (TextFunctions.punctRatio(col("text")) * 1048576.0)
            .cast("long").as("p"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok")),
        "doc_id",
        Seq(("q", false), ("p", true), ("ntok", false)),
        keepPct = 20)),

    // ---- IVF-PQ ANN: coarse cells prune the scan, PQ codes compress
    // the residual scan to m bytes/vector (ADC scoring)
    "s5_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", k = 3,
        Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8))
    }),

    // ---- persisted IVF-Flat index: build+save once (cell-partitioned
    // parquet + quantizer metadata), load in a fresh reader, serve —
    // the build-once-serve-many lifecycle; answers must be bit-equal
    // to the in-session s3 path, so the oracle is s3's verbatim
    "s10_saved_index" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scopedTmp("graft_annidx", dir)
      Similarity.saveIndex(emb,
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", path)
      Similarity.queryIndex(Similarity.loadIndex(s, path),
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
    }),

    // ---- filtered serving from the SAVED index: the s14 slice
    // request against the persisted lifecycle — the allow-list
    // semi-joins the cell frame BEFORE scoring (post-filtering a
    // top-k would be wrong), so the saved-index answer equals the
    // in-session filtered IVF bit-for-bit
    "s15_saved_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scopedTmp("graft_annidx_f", dir)
      Similarity.saveIndex(emb,
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", path)
      Similarity.queryIndex(
        Similarity.filterIndex(
          Similarity.loadIndex(s, path),
          emb.filter(pmod(col("label"), lit(2)) === 0).select(col("vec_id")),
          "vec_id"),
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
    }),

    // ---- incremental index maintenance: build the IVF index from the
    // even half only, APPEND the odd half against the frozen quantizer
    // (no rebuild, no touch of existing cells), then query — must
    // bit-equal s3's full-corpus IVF oracle. The daily-ingest path of
    // the ANN lifecycle: build → persist → serve → append → hot-swap
    "s13_incremental_add" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scopedTmp("graft_annidx_inc", dir)
      Similarity.saveIndex(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", path)
      Similarity.addToIndex(emb.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", path)
      Similarity.queryIndex(Similarity.loadIndex(s, path),
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
    }),

    // ---- persisted IVF-PQ index: stored m-byte codes are the scan
    // side after reload (ADC against codebook reconstructions);
    // oracle is s5's verbatim
    "s10b_saved_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = scopedTmp("graft_annidx_pq", dir)
      Similarity.saveIndex(emb,
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
        "vec_id", "embedding", path,
        Some(Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 8)))
      Similarity.queryIndex(Similarity.loadIndex(s, path),
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
    })
  )

  // ---- oracles ----------------------------------------------------------

  private[graft] val minhashSigCols: String = (0 until 16).map { j =>
    s"min((${Dedup.mhA(j)}*h + ${Dedup.mhB(j)}) % $P) AS s$j"
  }.mkString(", ")

  private[graft] def bandHashSql(b: Int, rpb: Int = 4): String =
    (0 until rpb).foldLeft("0") { (acc, r) => s"(($acc*131 + s${b * rpb + r}) % $P)" }

  private[graft] val sigAgreeSql: String =
    (0 until 16).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString("(", " + ", ")")

  /** SimHash near-dup candidate/verify CTEs (shared by
    * d4_simhash_pairs and d6_dedup_groups).
    */
  /** Connected components over a symmetric edge CTE `e(a, b)` as
    * UNROLLED min-label propagation with pointer jumping — O(|v| +
    * |e|) rows per round, replacing the recursive transitive-closure
    * walk whose intermediate is Σ|component|² rows (the former walk
    * spilled the DuckDB oracle past ~80 GB on sf1's replica
    * mega-components; r10 verdict task 5). Per round: each node takes
    * the min of its own and its neighbours' labels, then jumps to its
    * label's label. Convergence bound, stated honestly: the shortcut
    * step halves the depth of the CURRENT label forest, but the
    * neighbour-min hook can re-attach trees, so the clean "log₂(n)
    * rounds" argument of pure pointer jumping does not directly apply
    * — the measured behaviour is log-like (8 rounds left sf1's
    * chain-shaped replica mega-components one label short; 20
    * converged), and `rounds` = 24 adds margin over log₂(5·10⁵) ≈ 19
    * at linear cost. The safety property does not depend on the
    * bound: non-convergence leaves a component under two labels and
    * reds the gate against the engine's exact star-contraction — it
    * can never produce a silent green. Emits `comp(v, c)`.
    */
  private def componentCtes(rounds: Int = 24): String = {
    val init = "lab0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS l FROM e)"
    val steps = (1 to rounds).map { k =>
      s"""nb$k AS (SELECT e.a AS v, min(l.l) AS nl
         |       FROM e JOIN lab${k - 1} l ON e.b = l.v GROUP BY e.a),
         |mj$k AS MATERIALIZED (SELECT l.v, least(l.l, nb$k.nl) AS l
         |       FROM lab${k - 1} l JOIN nb$k ON l.v = nb$k.v),
         |lab$k AS (SELECT m1.v, least(m1.l, m2.l) AS l
         |       FROM mj$k m1 JOIN mj$k m2 ON m1.l = m2.v)""".stripMargin
    }
    // convergence ASSERTION (advisor r11): a fixed point of the hook
    // step over SYMMETRIC edges has l(a) = l(b) for every edge, i.e.
    // one label per component — so "last round changed nothing" is a
    // sound converged-check. If the unrolled budget ever runs out on a
    // deeper corpus, the oracle now raises 'rounds exhausted' by name
    // instead of red-hashing the gate as an apparent engine bug.
    val chk =
      s"""convchk AS (SELECT count(*) AS n FROM lab$rounds a
         |       JOIN lab${rounds - 1} b ON a.v = b.v WHERE a.l <> b.l)""".stripMargin
    (init +: steps :+ chk).mkString(",\n") +
      s""",\ncomp AS MATERIALIZED (SELECT v,
         |  CASE WHEN (SELECT n FROM convchk) > 0
         |       THEN CAST(error('componentCtes: $rounds rounds exhausted before convergence') AS BIGINT)
         |       ELSE l END AS c FROM lab$rounds)""".stripMargin
  }

  /** SimHash near-dup CTEs in the FACTORED (distinct-signature) shape
    * the engine itself uses (`Dedup.simhashFactored`): signatures are
    * deduplicated BEFORE the pigeonhole block join, so a corpus whose
    * duplication piles thousands of docs onto one signature joins
    * |distinct sigs| rows, never |docs| — the former doc-level block
    * join exploded quadratically on sf1's replica-heavy buckets and
    * held the DuckDB oracle at ~84 GB (r10 verdict task 5). Emits:
    * `sk(doc_id, sh)`, `sigs(sh, g, rep)` (group size + min-id
    * representative), and `shd(sh1, sh2, hamming)` — verified
    * DISTINCT-signature candidate pairs (identical-signature pairs are
    * implicit in `g`).
    */
  private val simhashFactoredCtes: String =
    s"""th AS (SELECT doc_id, [CASE WHEN t = '' THEN 0 ELSE ${phSql("t")} END for t in string_split(text,' ')] AS hs
       |            FROM documents),
       |sk AS MATERIALIZED (SELECT doc_id, ${simhashSql("hs", 48)} AS sh FROM th),
       |sigs AS MATERIALIZED (SELECT sh, CAST(count(*) AS BIGINT) AS g,
       |               min(doc_id) AS rep FROM sk GROUP BY sh),
       |blocks AS (${(0 until 3).map(k =>
           s"SELECT sh, $k AS blk, sh & ${65535L << (16 * k)} AS bv FROM sigs")
           .mkString(" UNION ALL ")}),
       |shd AS (SELECT a.sh AS sh1, b.sh AS sh2,
       |               bit_count(xor(a.sh, b.sh)) AS hamming
       |        FROM blocks a JOIN blocks b
       |          ON a.blk = b.blk AND a.bv = b.bv AND a.sh < b.sh
       |        GROUP BY 1, 2, 3)""".stripMargin

  /** Doc-level symmetric edge CTE over the factored simhash relation:
    * a star over each identical-signature group (min-id rep) plus one
    * rep-to-rep edge per verified distinct-signature pair — the
    * component-equivalent LINEAR edge set `Dedup.simhashEdges` builds
    * (a bucket clique and its star have the same connected
    * components). Expects [[simhashFactoredCtes]]; emits `e(a, b)`.
    */
  private val simhashEdgeCtes: String =
    """p AS (SELECT sh1, sh2 FROM shd WHERE hamming <= 2),
      |star AS (SELECT s.rep AS a, k.doc_id AS b
      |         FROM sk k JOIN sigs s ON k.sh = s.sh WHERE k.doc_id <> s.rep),
      |crossr AS (SELECT least(s1.rep, s2.rep) AS a, greatest(s1.rep, s2.rep) AS b
      |           FROM p JOIN sigs s1 ON p.sh1 = s1.sh JOIN sigs s2 ON p.sh2 = s2.sh),
      |e AS (SELECT a, b FROM star UNION SELECT b, a FROM star
      |      UNION SELECT a, b FROM crossr UNION SELECT b, a FROM crossr)""".stripMargin

  /** K-means CTE chain mirroring Clustering.kmeansCentroids /
    * kmeansAssign exactly for ANY iteration count: hash-seeded cells
    * 0..k-1, then per Lloyd round a refined centroid = the ELEMENTWISE
    * INTEGER SUM of `floor(1e6·x + 0.5)` over the previous assignment
    * (cosine is scale-invariant, integer sums commute — no
    * accumulation-order sensitivity), argmax assignment with ties to
    * the lowest cell. Intermediate assignments drop NaN (zero-norm)
    * rows — exactly `lloydSums`' `_cell >= 0` filter — and cells that
    * capture no rows vanish from the next round's quantizer (Lloyd
    * empty-cell dropout). Ends with `a$iters(vec_id, cell)` — the
    * final assignment, NaN → sentinel -1.
    */
  private def kmeansCtes(k: Int = 8, dims: Int = 64, iters: Int = 1): String = {
    val head =
      s"""h AS (SELECT vec_id, embedding, ${phSql("CAST(vec_id AS VARCHAR)")} AS hh
         |      FROM embeddings),
         |seeds AS (SELECT rn - 1 AS c, ce FROM (
         |            SELECT row_number() OVER (ORDER BY hh, vec_id) AS rn,
         |                   CAST(embedding AS DOUBLE[]) AS ce
         |            FROM h) WHERE rn <= $k),
         |s0 AS (SELECT vec_id, c, ${cosSql("embedding", "ce")} AS cos
         |       FROM embeddings CROSS JOIN seeds),
         |a0 AS (SELECT vec_id, c AS cell FROM (
         |         SELECT vec_id, c,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY cos DESC, c ASC) AS rn
         |         FROM s0 WHERE NOT isnan(cos)) WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val fin =
        if (i < iters)
          s"""a$i AS (SELECT vec_id, c AS cell FROM (
             |         SELECT vec_id, c,
             |                row_number() OVER (PARTITION BY vec_id
             |                  ORDER BY cos DESC, c ASC) AS rn
             |         FROM s$i WHERE NOT isnan(cos)) WHERE rn = 1)""".stripMargin
        else
          s"""a$i AS (SELECT e.vec_id, coalesce(x.cell, -1) AS cell
             |       FROM embeddings e LEFT JOIN (
             |         SELECT vec_id, c AS cell FROM (
             |           SELECT vec_id, c,
             |                  row_number() OVER (PARTITION BY vec_id
             |                    ORDER BY cos DESC, c ASC) AS rn
             |           FROM s$i WHERE NOT isnan(cos)) WHERE rn = 1) x
             |         ON e.vec_id = x.vec_id)""".stripMargin
      s"""sums$i AS (SELECT cell, d,
         |           sum(CAST(floor(1000000.0 * CAST(e.embedding[d] AS DOUBLE) + 0.5)
         |               AS BIGINT)) AS sm
         |         FROM a${i - 1} JOIN embeddings e USING (vec_id),
         |              (SELECT unnest(generate_series(1, $dims)) AS d)
         |         GROUP BY cell, d),
         |cref$i AS (SELECT cell AS c, list(CAST(sm AS DOUBLE) ORDER BY d) AS ce
         |         FROM sums$i GROUP BY cell),
         |s$i AS (SELECT vec_id, c, ${cosSql("embedding", "ce")} AS cos
         |       FROM embeddings CROSS JOIN cref$i),
         |$fin""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** PQ CTE chain mirroring Similarity.pqCodebooks / pqEncode exactly:
    * hash-seeded codewords (the k smallest-id-hash rows, ties by id),
    * per-subspace codebook = seed subvector slices, code = argmax
    * cosine with ties to the lowest code and NaN (zero-norm subvector)
    * → sentinel -1. Ends with `codes(vec_id, m, code)` over the full
    * corpus × subspace domain.
    */
  private def pqCtes(m: Int = 4, k: Int = 8, dims: Int = 64): String = {
    val sub = dims / m
    s"""h AS (SELECT vec_id, embedding, ${phSql("CAST(vec_id AS VARCHAR)")} AS hh
       |      FROM embeddings),
       |seeds AS (SELECT rn - 1 AS c, ce FROM (
       |            SELECT row_number() OVER (ORDER BY hh, vec_id) AS rn,
       |                   CAST(embedding AS DOUBLE[]) AS ce
       |            FROM h) WHERE rn <= $k),
       |mm AS (SELECT unnest(generate_series(0, ${m - 1})) AS m),
       |cb AS (SELECT c, m, ce[m*$sub+1 : m*$sub+$sub] AS sl FROM seeds CROSS JOIN mm),
       |sc AS (SELECT e.vec_id, cb.m, cb.c,
       |         ${cosSql(s"e.embedding[cb.m*$sub+1 : cb.m*$sub+$sub]", "sl")} AS cos
       |       FROM embeddings e CROSS JOIN cb),
       |codes AS (SELECT d.vec_id, d.m, coalesce(x.code, -1) AS code
       |          FROM (SELECT vec_id, m FROM embeddings CROSS JOIN mm) d
       |          LEFT JOIN (
       |            SELECT vec_id, m, c AS code FROM (
       |              SELECT vec_id, m, c, row_number() OVER (PARTITION BY vec_id, m
       |                ORDER BY cos DESC, c ASC) AS rn
       |              FROM sc WHERE NOT isnan(cos)) WHERE rn = 1) x
       |            ON d.vec_id = x.vec_id AND d.m = x.m)""".stripMargin
  }

  /** One power-method step as a DuckDB CTE pair (dangling mass +
    * contributions + new rank), unrolled [[pageRankSql]] times — the
    * oracle mirrors [[graft.pipeline.GraphOps.pageRank]] structurally.
    */
  private def prStepSql(i: Int): String = {
    val prev = s"pr${i - 1}"
    s"""d$i AS (SELECT coalesce(sum(pr), 0) AS dm FROM $prev
       |        WHERE id NOT IN (SELECT src FROM ow)),
       |c$i AS (SELECT en.dst AS id, sum(en.p * $prev.pr) AS c
       |        FROM en JOIN $prev ON en.src = $prev.id GROUP BY 1),
       |pr$i AS (SELECT nodes.id,
       |           0.15 / nn.n + 0.85 * (coalesce(c$i.c, 0) + d$i.dm / nn.n) AS pr
       |         FROM nodes CROSS JOIN nn CROSS JOIN d$i
       |         LEFT JOIN c$i ON nodes.id = c$i.id)""".stripMargin
  }

  private def pageRankSql(iters: Int): String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |              CAST(props->>'$$.k' AS BIGINT) AS k FROM events),
       |p AS (SELECT k AS dst, lag(k) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS src FROM ev),
       |e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM p
       |      WHERE src IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
       |en AS (SELECT e.src, e.dst, e.w / ow.ow AS p FROM e JOIN ow USING (src)),
       |pr0 AS (SELECT id, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
       |${(1 to iters).map(prStepSql).mkString(",\n")}
       |SELECT id, pr FROM pr$iters""".stripMargin

  /** One synchronous label-propagation round: neighbor label mass by
    * integer sum, winner = heaviest label with min-label ties. */
  private def lpStepSql(i: Int): String =
    s"""m$i AS (SELECT eu.dst AS id, p.lbl AS lbl, CAST(sum(eu.w) AS BIGINT) AS m
       |        FROM eu JOIN lp${i - 1} p ON eu.src = p.id GROUP BY 1, 2),
       |lp$i AS (SELECT id, lbl FROM (
       |           SELECT id, lbl, row_number() OVER (PARTITION BY id
       |             ORDER BY m DESC, lbl ASC) AS rn FROM m$i) WHERE rn = 1)""".stripMargin

  private def labelPropagationSql(iters: Int): String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |              CAST(props->>'$$.k' AS BIGINT) AS k FROM events),
       |p AS (SELECT k AS dst, lag(k) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS src FROM ev),
       |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM p
       |      WHERE src IS NOT NULL GROUP BY 1, 2),
       |eu AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
       |         SELECT src, dst, w FROM e
       |         UNION ALL SELECT dst AS src, src AS dst, w FROM e)
       |       GROUP BY 1, 2),
       |lp0 AS (SELECT DISTINCT src AS id, src AS lbl FROM eu),
       |${(1 to iters).map(lpStepSql).mkString(",\n")}
       |SELECT id, lbl FROM lp$iters""".stripMargin

  /** g8's oracle: the [[labelPropagationSql]] chain continued into the
    * Newman-modularity arithmetic (HUGEINT cross-form, truncating `//`
    * to match Spark's decimal `div`).
    */
  private def modularitySql(iters: Int): String = {
    val lpa = labelPropagationSql(iters)
    val body = lpa.substring(0, lpa.lastIndexOf("SELECT id, lbl FROM"))
      .trim.stripSuffix(",")
    s"""$body,
       |lbl AS (SELECT id, lbl FROM lp$iters),
       |w2 AS (SELECT CAST(sum(w) AS BIGINT) AS w2 FROM eu),
       |deg AS (SELECT l.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
       |          CAST(sum(d._d) AS BIGINT) AS deg_w
       |        FROM (SELECT src AS id, sum(w) AS _d FROM eu GROUP BY 1) d
       |        JOIN lbl l USING (id) GROUP BY 1),
       |inw AS (SELECT ls.lbl, CAST(sum(eu.w) AS BIGINT) AS in_w
       |        FROM eu JOIN lbl ls ON eu.src = ls.id
       |             JOIN lbl ld ON eu.dst = ld.id
       |        WHERE ls.lbl = ld.lbl GROUP BY 1),
       |sing AS (SELECT DISTINCT src AS id, src AS lbl FROM eu),
       |${Seq(("lbl", "lpa"), ("sing", "singletons")).map { case (lblCte, tag) =>
           s"""deg_$tag AS (SELECT l.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
              |          CAST(sum(d._d) AS BIGINT) AS deg_w
              |        FROM (SELECT src AS id, sum(w) AS _d FROM eu GROUP BY 1) d
              |        JOIN $lblCte l USING (id) GROUP BY 1),
              |inw_$tag AS (SELECT ls.lbl, CAST(sum(eu.w) AS BIGINT) AS in_w
              |        FROM eu JOIN $lblCte ls ON eu.src = ls.id
              |             JOIN $lblCte ld ON eu.dst = ld.id
              |        WHERE ls.lbl = ld.lbl GROUP BY 1),
              |per_$tag AS (SELECT d.lbl, d.n_nodes, coalesce(i.in_w, 0) AS in_w,
              |          d.deg_w,
              |          CAST(((CAST(coalesce(i.in_w, 0) AS HUGEINT) * w2.w2
              |                 - CAST(d.deg_w AS HUGEINT) * d.deg_w) * 1000000)
              |               // (CAST(w2.w2 AS HUGEINT) * w2.w2) AS BIGINT)
              |            AS contrib_micro
              |        FROM deg_$tag d LEFT JOIN inw_$tag i ON d.lbl = i.lbl, w2),
              |tot_$tag AS (SELECT CAST((sum(CAST(in_w AS HUGEINT) * w2.w2
              |                    - CAST(deg_w AS HUGEINT) * deg_w) * 1000000)
              |                 // (CAST(max(w2.w2) AS HUGEINT) * max(w2.w2)) AS BIGINT)
              |          AS q_micro
              |        FROM per_$tag, w2)""".stripMargin
         }.mkString(",\n")}
       |SELECT p.lbl, p.n_nodes, p.in_w, p.deg_w, p.contrib_micro,
       |       t.q_micro, 'lpa' AS partition
       |FROM per_lpa p, tot_lpa t
       |UNION ALL
       |SELECT p.lbl, p.n_nodes, p.in_w, p.deg_w, p.contrib_micro,
       |       t.q_micro, 'singletons' AS partition
       |FROM per_singletons p, tot_singletons t""".stripMargin
  }

  /** [[prStepSql]]'s personalized twin: teleport rides the seed vector
    * `tv.t` instead of the uniform 1/n. */
  private def pprStepSql(i: Int): String = {
    val prev = s"pr${i - 1}"
    s"""d$i AS (SELECT coalesce(sum(pr), 0) AS dm FROM $prev
       |        WHERE id NOT IN (SELECT src FROM ow)),
       |c$i AS (SELECT en.dst AS id, sum(en.p * $prev.pr) AS c
       |        FROM en JOIN $prev ON en.src = $prev.id GROUP BY 1),
       |pr$i AS (SELECT tv.id,
       |           0.15 * tv.t + 0.85 * (coalesce(c$i.c, 0) + d$i.dm * tv.t) AS pr
       |         FROM tv CROSS JOIN d$i
       |         LEFT JOIN c$i ON tv.id = c$i.id)""".stripMargin
  }

  private def personalizedPageRankSql(iters: Int): String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |              CAST(props->>'$$.k' AS BIGINT) AS k FROM events),
       |p AS (SELECT k AS dst, lag(k) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS src FROM ev),
       |e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM p
       |      WHERE src IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
       |sf AS (SELECT id, CASE WHEN id BETWEEN 0 AND 9 THEN 1 ELSE 0 END AS s FROM nodes),
       |ns AS (SELECT CAST(sum(s) AS DOUBLE) AS ns FROM sf),
       |tv AS (SELECT id, s / ns.ns AS t FROM sf CROSS JOIN ns),
       |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
       |en AS (SELECT e.src, e.dst, e.w / ow.ow AS p FROM e JOIN ow USING (src)),
       |pr0 AS (SELECT id, t AS pr FROM tv),
       |${(1 to iters).map(pprStepSql).mkString(",\n")}
       |SELECT id, pr FROM pr$iters""".stripMargin

  /** One HITS iteration (authority then hub half-step, each L1-
    * normalized) as DuckDB CTEs — mirrors [[graft.pipeline.GraphOps.hits]]. */
  private def hitsStepSql(i: Int): String = {
    val prevH = s"h${i - 1}"
    s"""ar$i AS (SELECT e.dst AS id, sum(e.w * $prevH.h) AS ar
       |         FROM e JOIN $prevH ON e.src = $prevH.id GROUP BY 1),
       |at$i AS (SELECT sum(ar) AS at FROM ar$i),
       |a$i AS (SELECT nodes.id, coalesce(ar$i.ar, 0) / at$i.at AS a
       |        FROM nodes CROSS JOIN at$i LEFT JOIN ar$i ON nodes.id = ar$i.id),
       |hr$i AS (SELECT e.src AS id, sum(e.w * a$i.a) AS hr
       |         FROM e JOIN a$i ON e.dst = a$i.id GROUP BY 1),
       |ht$i AS (SELECT sum(hr) AS ht FROM hr$i),
       |h$i AS (SELECT nodes.id, coalesce(hr$i.hr, 0) / ht$i.ht AS h
       |        FROM nodes CROSS JOIN ht$i LEFT JOIN hr$i ON nodes.id = hr$i.id)""".stripMargin
  }

  private def hitsSql(iters: Int): String =
    s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |              CAST(props->>'$$.k' AS BIGINT) AS k FROM events),
       |p AS (SELECT k AS dst, lag(k) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id) AS src FROM ev),
       |e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM p
       |      WHERE src IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
       |h0 AS (SELECT id, 1.0 AS h FROM nodes),
       |${(1 to iters).map(hitsStepSql).mkString(",\n")}
       |SELECT h$iters.id, h$iters.h AS s_hub, a$iters.a AS s_auth
       |FROM h$iters JOIN a$iters ON h$iters.id = a$iters.id""".stripMargin

  private val oracles0: Map[String, String] = Map(
    "g1_pagerank" -> pageRankSql(3),
    "g2_personalized_pagerank" -> personalizedPageRankSql(3),
    "g3_hits" -> hitsSql(2),
    "g4_label_propagation" -> labelPropagationSql(3),
    "g8_modularity" -> modularitySql(3),

    // canonical x<y<z triangle enumeration over the distinct
    // undirected edge set — the orientation trick is a physical
    // strategy, not a semantics change, so the oracle stays naive
    "g5_triangles" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |              CAST(props->>'$.k' AS BIGINT) AS k FROM events),
        |p AS (SELECT k AS dst, lag(k) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS src FROM ev),
        |u AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |      FROM p WHERE src IS NOT NULL AND src <> dst),
        |t AS (SELECT a.lo AS x, a.hi AS y, b.hi AS z
        |      FROM u a JOIN u b ON a.lo = b.lo AND a.hi < b.hi
        |      JOIN u c ON c.lo = a.hi AND c.hi = b.hi)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT x AS node FROM t
        |  UNION ALL SELECT y FROM t
        |  UNION ALL SELECT z FROM t)
        |GROUP BY 1""".stripMargin,

    "g6_kcore" -> {
      // peel rounds unrolled into CTE stages — the same bounded
      // deterministic iteration the Spark loop runs
      val peels = (1 to 3).map { i =>
        s"""k$i AS (SELECT src FROM d${i - 1} GROUP BY src HAVING count(*) >= 3),
           |d$i AS (SELECT d.src, d.dst FROM d${i - 1} d
           |        JOIN k$i a ON d.src = a.src
           |        JOIN k$i b ON d.dst = b.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         |              CAST(props->>'$$.k' AS BIGINT) AS k FROM events),
         |p AS (SELECT k AS dst, lag(k) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id) AS src FROM ev),
         |e AS (SELECT src, dst FROM p WHERE src IS NOT NULL AND src <> dst),
         |d0 AS (SELECT DISTINCT src, dst FROM (
         |         SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
         |$peels
         |SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
         |FROM d3 GROUP BY src""".stripMargin
    },

    "d1_dedup_exact" ->
      "SELECT text, min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text",

    // same grouping, summary only — the hash-first plan must land on
    // the identical (keep_id, n_dups) multiset
    "d1b_dedup_exact_hash" ->
      "SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text",

    // the planted-twin augmentation (every 101st long doc, first word
    // replaced) is replayed verbatim — see the d2 queries() entry
    "d2_ngram_jaccard" ->
      s"""WITH documents_aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000000, 'graftdup' || substr(text, position(' ' IN text))
         |  FROM documents
         |  WHERE doc_id % 101 = 0 AND len(string_split(text,' ')) >= 13),
         |toks AS (SELECT doc_id, text, string_split(text,' ') AS w FROM documents_aug),
         |g AS (SELECT doc_id, unnest(generate_series(1, len(w)-2)) AS i, w FROM toks),
         |sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s FROM g),
         |shh AS (SELECT DISTINCT doc_id, ${phSql("s")} AS sh FROM sh),
         |hsets AS (SELECT doc_id, list_sort(list(sh)) AS hset, count(*) AS n
         |          FROM shh GROUP BY doc_id),
         |prefix AS (SELECT doc_id,
         |             unnest(hset[1 : CAST(n - ceil(0.8 * n) + 1 AS BIGINT)]) AS sh
         |           FROM hsets),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |hs AS (SELECT doc_id, list(sh) AS hset, count(*) AS n FROM shh GROUP BY doc_id),
         |v AS (SELECT id1, id2, len(list_intersect(a.hset, b.hset)) AS i, a.n AS n1, b.n AS n2
         |      FROM cand JOIN hs a ON id1 = a.doc_id JOIN hs b ON id2 = b.doc_id),
         |j AS (SELECT id1, id2, i*1.0/(n1 + n2 - i) AS jaccard FROM v)
         |SELECT id1, id2, jaccard FROM j WHERE jaccard >= 0.8""".stripMargin,

    // candidates = share one df<=100 gram (the operator's documented
    // contract); containments exact on the full hash sets
    "d18_containment" ->
      s"""WITH $shingleCtes,
         |shh AS (SELECT DISTINCT doc_id, ${phSql("s")} AS sh FROM sh),
         |hs AS (SELECT doc_id, list(sh) AS hset, count(*) AS n FROM shh GROUP BY doc_id),
         |rare AS (SELECT sh FROM shh GROUP BY sh HAVING count(*) <= 100),
         |idx AS (SELECT doc_id, sh FROM shh JOIN rare USING (sh)),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |v AS (SELECT id1, id2, len(list_intersect(a.hset, b.hset)) AS inter,
         |             a.n AS n1, b.n AS n2
         |      FROM cand JOIN hs a ON id1 = a.doc_id JOIN hs b ON id2 = b.doc_id)
         |SELECT id1, id2, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |       CAST(inter AS BIGINT) AS inter,
         |       CAST(inter*1000//n1 AS BIGINT) AS c1_milli,
         |       CAST(inter*1000//n2 AS BIGINT) AS c2_milli
         |FROM v WHERE inter*1000 >= 500 * least(n1, n2)""".stripMargin,

    // winnowing replayed via the tx4 declarative fragment (char
    // 20-gram hashes, window-8 minima, distinct per doc), then the
    // df-capped inverted fingerprint index and pair counts
    "d19_winnow_pairs" ->
      s"""WITH b AS (SELECT doc_id, text, len(text) AS L FROM documents
         |           WHERE text IS NOT NULL),
         |kh AS (SELECT doc_id,
         |         [${phSql("substr(text, i, 20)")} for i in generate_series(1, L-19)] AS kh
         |       FROM b WHERE L >= 27),
         |f0 AS (SELECT doc_id,
         |         list_distinct([list_min(kh[j:j+7]) for j in generate_series(1, len(kh)-7)]) AS fps
         |       FROM kh),
         |f AS (SELECT doc_id, unnest(fps) AS fp FROM f0),
         |nf AS (SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp FROM f0
         |       WHERE len(fps) >= 1),
         |rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 100),
         |fr AS (SELECT doc_id, fp FROM f JOIN rare USING (fp)),
         |p AS (SELECT a.doc_id AS id1, b2.doc_id AS id2,
         |             CAST(count(*) AS BIGINT) AS shared_fps
         |      FROM fr a JOIN fr b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id
         |      GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT id1, id2, shared_fps, n1.n_fp AS n_fp1, n2.n_fp AS n_fp2,
         |       CAST(shared_fps * 1000 // least(n1.n_fp, n2.n_fp) AS BIGINT)
         |         AS overlap_milli
         |FROM p JOIN nf n1 ON id1 = n1.doc_id
         |       JOIN nf n2 ON id2 = n2.doc_id""".stripMargin,

    // the report twin: the same fingerprint frame folded to its df
    // histogram — no pair anywhere
    "d19b_winnow_stats" ->
      s"""WITH b AS (SELECT doc_id, text, len(text) AS L FROM documents
         |           WHERE text IS NOT NULL),
         |kh AS (SELECT doc_id,
         |         [${phSql("substr(text, i, 20)")} for i in generate_series(1, L-19)] AS kh
         |       FROM b WHERE L >= 27),
         |f0 AS (SELECT doc_id,
         |         list_distinct([list_min(kh[j:j+7]) for j in generate_series(1, len(kh)-7)]) AS fps
         |       FROM kh),
         |f AS (SELECT doc_id, unnest(fps) AS fp FROM f0),
         |d AS (SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |      FROM f GROUP BY fp)
         |SELECT df, CAST(count(*) AS BIGINT) AS n_fps,
         |       CAST(least(CAST(count(*) AS HUGEINT) *
         |              (CAST(df AS HUGEINT) * (df - 1) // 2),
         |            9223372036854775807) AS BIGINT) AS pair_slots,
         |       df > 100 AS capped
         |FROM d GROUP BY df""".stripMargin,

    "d3_minhash_lsh" ->
      s"""WITH $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT id1, id2, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON id1 = a.doc_id JOIN sig b ON id2 = b.doc_id)
         |SELECT id1, id2, est_jaccard FROM est WHERE est_jaccard >= 0.5""".stripMargin,

    "d3e_band_occupancy" ->
      s"""WITH $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |bk AS (SELECT band, bh, count(*) AS g FROM bands GROUP BY 1, 2)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         |       CAST(sum(g) AS BIGINT) AS n_docs,
         |       CAST(sum(g * (g - 1) // 2) AS BIGINT) AS pair_mass
         |FROM bk GROUP BY band""".stripMargin,

    "d4_simhash" ->
      s"""WITH th AS (SELECT doc_id, [CASE WHEN t = '' THEN 0 ELSE ${phSql("t")} END for t in string_split(text,' ')] AS hs
         |            FROM documents)
         |SELECT doc_id, ${simhashSql("hs")} AS simhash FROM th""".stripMargin,

    // d4's formula over the tie-dense 2-token prefix (strict majority
    // replayed in SQL — the rule d4c exists to pin)
    "d4c_simhash_declarative" ->
      s"""WITH th AS (SELECT doc_id, [CASE WHEN t = '' THEN 0 ELSE ${phSql("t")} END for t in string_split(text,' ')[1:2]] AS hs
         |            FROM documents)
         |SELECT doc_id, ${simhashSql("hs")} AS simhash FROM th""".stripMargin,

    "d4_simhash_pairs" ->
      s"""WITH $simhashFactoredCtes,
         |within AS (SELECT a.doc_id AS id1, b.doc_id AS id2, 0 AS hamming
         |           FROM sk a JOIN sk b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |crossp AS (SELECT least(a.doc_id, b.doc_id) AS id1,
         |                  greatest(a.doc_id, b.doc_id) AS id2, p.hamming
         |           FROM (SELECT * FROM shd WHERE hamming <= 2) p
         |           JOIN sk a ON a.sh = p.sh1 JOIN sk b ON b.sh = p.sh2)
         |SELECT id1, id2, CAST(hamming AS INTEGER) AS hamming FROM within
         |UNION ALL
         |SELECT id1, id2, CAST(hamming AS INTEGER) AS hamming FROM crossp""".stripMargin,

    // pair-report oracles: enumerate the SAME relation, then aggregate
    // (the engine computes these counts analytically from group sizes)
    // group-digest arithmetic over the factored relation (the engine's
    // own pairStatsFromGroups shape): within-group pairs are C(g,2),
    // cross pairs g1*g2 — nothing doc-level is ever enumerated
    "d4b_simhash_stats" ->
      s"""WITH $simhashFactoredCtes,
         |p AS (SELECT sh1, sh2, CAST(hamming AS BIGINT) AS hamming
         |      FROM shd WHERE hamming <= 2),
         |within AS (SELECT CAST(0 AS BIGINT) AS hamming,
         |             CAST(sum(g * (g - 1) // 2) AS BIGINT) AS n_pairs,
         |             CAST(sum(g) AS BIGINT) AS n_docs
         |           FROM sigs WHERE g >= 2),
         |cr AS (SELECT p.hamming, CAST(sum(s1.g * s2.g) AS BIGINT) AS n_pairs
         |       FROM p JOIN sigs s1 ON p.sh1 = s1.sh JOIN sigs s2 ON p.sh2 = s2.sh
         |       GROUP BY 1),
         |du AS (SELECT hamming, CAST(sum(g) AS BIGINT) AS n_docs FROM (
         |         SELECT DISTINCT hamming, sh FROM (
         |           SELECT hamming, sh1 AS sh FROM p
         |           UNION ALL SELECT hamming, sh2 AS sh FROM p))
         |       JOIN sigs USING (sh) GROUP BY hamming)
         |SELECT hamming, n_pairs, n_docs FROM within WHERE n_pairs > 0
         |UNION ALL
         |SELECT cr.hamming, cr.n_pairs, du.n_docs FROM cr JOIN du USING (hamming)""".stripMargin,

    "d3c_lsh_calibration" ->
      s"""WITH $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |hsets AS (SELECT doc_id, list(DISTINCT h) AS hset FROM hs GROUP BY doc_id),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT id1, id2, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON id1 = a.doc_id JOIN sig b ON id2 = b.doc_id),
         |samp AS (SELECT id1, id2, est_jaccard FROM est
         |         WHERE est_jaccard >= 0.5 AND (id1 * 1000003 + id2) % 7 = 0),
         |j AS (SELECT est_jaccard,
         |             len(list_intersect(a.hset, b.hset)) AS i,
         |             len(a.hset) + len(b.hset) - len(list_intersect(a.hset, b.hset)) AS u
         |      FROM samp JOIN hsets a ON id1 = a.doc_id JOIN hsets b ON id2 = b.doc_id)
         |SELECT est_jaccard, count(*) AS n_pairs,
         |       CAST(sum(i) AS BIGINT) AS sum_inter,
         |       CAST(sum(u) AS BIGINT) AS sum_union
         |FROM j GROUP BY est_jaccard""".stripMargin,

    "d3d_lsh_threshold_pick" ->
      s"""WITH $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |hsets AS (SELECT doc_id, list(DISTINCT h) AS hset FROM hs GROUP BY doc_id),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bnd AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cnd AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |        FROM bnd a JOIN bnd b
         |          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT id1, id2, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cnd JOIN sig a ON id1 = a.doc_id JOIN sig b ON id2 = b.doc_id),
         |samp AS (SELECT id1, id2, est_jaccard FROM est
         |         WHERE est_jaccard >= 0.5 AND (id1 * 1000003 + id2) % 7 = 0),
         |j AS (SELECT est_jaccard,
         |             len(list_intersect(a.hset, b.hset)) AS i,
         |             len(a.hset) + len(b.hset) - len(list_intersect(a.hset, b.hset)) AS u
         |      FROM samp JOIN hsets a ON id1 = a.doc_id JOIN hsets b ON id2 = b.doc_id),
         |lv AS (SELECT CAST(est_jaccard * 16 AS BIGINT) AS k,
         |              CAST(sum(i) AS BIGINT) AS sum_inter,
         |              CAST(sum(u) AS BIGINT) AS sum_union
         |       FROM j GROUP BY est_jaccard),
         |agg AS (SELECT a.k AS k, CAST(SUM(b.sum_inter) AS BIGINT) AS i_mass,
         |               CAST(SUM(b.sum_union) AS BIGINT) AS u_mass
         |        FROM lv a JOIN lv b ON b.k >= a.k GROUP BY a.k),
         |cut AS (SELECT COALESCE(MIN(k), 17) AS cutoff_k FROM agg
         |        WHERE i_mass * 5 >= u_mass * 4),
         |cand(bands, rows_per_band) AS (SELECT * FROM (VALUES (2, 8), (4, 4), (8, 2))),
         |ranked AS (SELECT x.bands, x.rows_per_band,
         |             CAST(SUM(CASE WHEN CAST(power(x.bands, y.rows_per_band) AS BIGINT)
         |                            > CAST(power(y.bands, x.rows_per_band) AS BIGINT)
         |                      THEN 1 ELSE 0 END) AS BIGINT) AS rnk
         |           FROM cand x, cand y GROUP BY x.bands, x.rows_per_band),
         |o AS (SELECT bands, rows_per_band, rnk, cutoff_k,
         |        CAST(power(16, rows_per_band) AS BIGINT)
         |          <= CAST(power(cutoff_k, rows_per_band) AS BIGINT) * bands AS mid_le_cutoff
         |      FROM ranked, cut),
         |anye AS (SELECT MAX(CASE WHEN mid_le_cutoff THEN 1 ELSE 0 END) AS any_e FROM o),
         |mine AS (SELECT MIN(CASE WHEN mid_le_cutoff THEN rnk END) AS min_r FROM o)
         |SELECT bands, rows_per_band, rnk, cutoff_k, mid_le_cutoff,
         |       CASE WHEN any_e = 1 THEN (mid_le_cutoff AND rnk = min_r)
         |            ELSE rnk = 2 END AS chosen
         |FROM o, anye, mine""".stripMargin,

    "d3b_minhash_stats" ->
      s"""WITH $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT id1, id2, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON id1 = a.doc_id JOIN sig b ON id2 = b.doc_id),
         |p AS (SELECT id1, id2, est_jaccard FROM est WHERE est_jaccard >= 0.5),
         |pa AS (SELECT est_jaccard, count(*) AS n_pairs FROM p GROUP BY est_jaccard),
         |da AS (SELECT est_jaccard, count(DISTINCT d) AS n_docs FROM
         |       (SELECT est_jaccard, id1 AS d FROM p
         |        UNION ALL SELECT est_jaccard, id2 FROM p) GROUP BY est_jaccard)
         |SELECT pa.est_jaccard,
         |       CAST(n_pairs AS BIGINT) AS n_pairs,
         |       CAST(n_docs AS BIGINT) AS n_docs
         |FROM pa JOIN da USING (est_jaccard)""".stripMargin,

    // connected components over the simhash near-dup graph: unrolled
    // min-label pointer-jumping propagation (linear per round; the
    // recursive min-reachable walk was Σ|comp|² and spilled at sf1)
    "d6_dedup_groups" ->
      s"""WITH $simhashFactoredCtes,
         |$simhashEdgeCtes,
         |${componentCtes()}
         |SELECT v AS doc_id, c AS component FROM comp""".stripMargin,

    // the d6 components + token masses folded to the per-size savings
    // sheet (linear pointer-jumping components, see componentCtes)
    "d20_dedup_savings" ->
      s"""WITH $simhashFactoredCtes,
         |$simhashEdgeCtes,
         |${componentCtes()},
         |tk AS (SELECT doc_id AS id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
         |       FROM documents),
         |g AS (SELECT c AS component, CAST(count(*) AS BIGINT) AS gsize,
         |        CAST(sum(nt) AS BIGINT) AS tok,
         |        CAST(min(CASE WHEN v = c THEN nt END) AS BIGINT) AS kept
         |      FROM comp JOIN tk ON tk.id = comp.v GROUP BY 1)
         |SELECT gsize AS group_size, CAST(count(*) AS BIGINT) AS n_groups,
         |       CAST(sum(gsize) AS BIGINT) AS n_docs,
         |       CAST(sum(tok) AS BIGINT) AS total_tokens,
         |       CAST(sum(tok - kept) AS BIGINT) AS saved_tokens
         |FROM g GROUP BY 1""".stripMargin,

    "d7_dedup_corpus" ->
      s"""WITH $simhashFactoredCtes,
         |$simhashEdgeCtes,
         |${componentCtes()},
         |dropped AS (SELECT v FROM comp WHERE v <> c)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT v FROM dropped)""".stripMargin,

    "d13_minhash_dedup" ->
      s"""WITH RECURSIVE $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT id1, id2, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON id1 = a.doc_id JOIN sig b ON id2 = b.doc_id),
         |p AS (SELECT id1, id2 FROM est WHERE est_jaccard >= 0.5),
         |e AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
         |walk(v, l) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT e.b, w.l FROM walk w JOIN e ON w.v = e.a),
         |dropped AS (SELECT v FROM (SELECT v, min(l) AS c FROM walk GROUP BY v) WHERE v <> c)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT v FROM dropped)""".stripMargin,

    "d17_soft_dedup" ->
      s"""WITH $simhashFactoredCtes,
         |$simhashEdgeCtes,
         |${componentCtes()},
         |sizes AS (SELECT c, count(*) AS n FROM comp GROUP BY c),
         |m AS (SELECT comp.v AS doc_id, sizes.n FROM comp JOIN sizes ON comp.c = sizes.c),
         |withn AS (SELECT d.doc_id, d.n_chars, coalesce(m.n, 1) AS dup_count
         |          FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id)
         |SELECT doc_id, n_chars, CAST(dup_count AS BIGINT) AS dup_count FROM withn
         |WHERE ${phSql("CAST(doc_id AS VARCHAR)")} % dup_count = 0""".stripMargin,

    "d9_substring_dup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |g AS (SELECT doc_id, unnest(generate_series(1, len(w)-9)) AS i, w
         |      FROM t WHERE len(w) >= 10),
         |gh AS (SELECT doc_id, ${phSql("array_to_string(w[i:i+9], ' ')")} AS h FROM g),
         |f AS (SELECT h, count(*) AS cnt FROM gh GROUP BY h)
         |SELECT doc_id, count(*) AS n_grams,
         |       CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pos,
         |       CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
         |         CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM gh JOIN f USING (h)
         |GROUP BY doc_id""".stripMargin,

    "d12_substring_remove" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |g AS (SELECT doc_id, unnest(generate_series(1, len(w)-9)) AS i, w
         |      FROM t WHERE len(w) >= 10),
         |gh AS (SELECT doc_id, i, ${phSql("array_to_string(w[i:i+9], ' ')")} AS h FROM g),
         |f AS (SELECT h, count(*) AS cnt FROM gh GROUP BY h),
         |dup AS (SELECT doc_id, i FROM gh JOIN f USING (h) WHERE cnt >= 2),
         |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(i, i+9)) AS p FROM dup),
         |tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS p, w FROM t),
         |kept AS (SELECT tok.doc_id, tok.p, tok.w[tok.p] AS tk FROM tok
         |         LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
         |         WHERE cov.p IS NULL),
         |rb AS (SELECT doc_id, array_to_string(list(tk ORDER BY p), ' ') AS clean_text
         |       FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(rb.clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN rb USING (doc_id)""".stripMargin,

    "d5_embed_neardup" ->
      s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS b FROM embeddings)
         |SELECT * FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${cosSql("a.embedding", "b.embedding")} AS cosine
         |  FROM bk a JOIN bk b ON a.b = b.b AND a.vec_id < b.vec_id)
         |WHERE cosine >= 0.45""".stripMargin,

    "d5b_embed_neardup_exact" ->
      s"""SELECT * FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${cosSql("a.embedding", "b.embedding")} AS cosine
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE a.vec_id < 500 AND b.vec_id < 500)
         |WHERE cosine >= 0.45""".stripMargin,

    "s1_ann_bruteforce" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 5""".stripMargin,

    // greedy MMR replayed as a recursive CTE: each step a correlated
    // argmax scalar subquery over the unpicked candidates; integer
    // dots on the same trunc(x·2^20) grid (products ≤ 2^46 — exact in
    // the double list_dot_product, cast back loss-free)
    "s22_mmr" ->
      s"""WITH RECURSIVE
         |qz AS (SELECT vec_id,
         |         [CAST(trunc(CAST(x AS DOUBLE)*1048576.0) AS BIGINT)
         |          for x in embedding] AS qv
         |       FROM embeddings),
         |rel AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |          CAST(list_dot_product(CAST(q.qv AS DOUBLE[]),
         |               CAST(c.qv AS DOUBLE[])) AS BIGINT) AS rel
         |        FROM qz q JOIN qz c ON q.vec_id <> c.vec_id
         |        WHERE q.vec_id < 8),
         |cand AS (SELECT *, row_number() OVER (PARTITION BY qid
         |           ORDER BY rel DESC, cid ASC) AS p
         |         FROM rel QUALIFY p <= 10),
         |sims AS (SELECT a.qid, a.p, b.p AS q2,
         |           CAST(list_dot_product(CAST(va.qv AS DOUBLE[]),
         |                CAST(vb.qv AS DOUBLE[])) AS BIGINT) AS sim
         |         FROM cand a JOIN cand b ON a.qid = b.qid
         |              JOIN qz va ON va.vec_id = a.cid
         |              JOIN qz vb ON vb.vec_id = b.cid),
         |sel(qid, picked, step) AS (
         |  SELECT DISTINCT qid, CAST([] AS INT[]), 0 FROM cand
         |  UNION ALL
         |  -- argmax per step as join + two aggregates (no correlated
         |  -- subqueries — those crash inside recursion); the sort key
         |  -- packs (score, -p) into one HUGEINT: score*1024 - p, with
         |  -- p <= 10 < 1024, so max_by is (score desc, p asc)
         |  SELECT qid, list_append(picked, CAST(max_by(p, key) AS INT)), step + 1
         |  FROM (
         |    SELECT s.qid, s.picked, s.step, c.p,
         |           (CAST(700 AS HUGEINT) * c.rel
         |            - CAST(300 AS HUGEINT) * coalesce(max(sm.sim), 0)) * 1024
         |             - c.p AS key
         |    FROM sel s
         |    JOIN cand c ON c.qid = s.qid AND NOT list_contains(s.picked, c.p)
         |    LEFT JOIN sims sm ON sm.qid = s.qid AND sm.p = c.p
         |                      AND list_contains(s.picked, sm.q2)
         |    WHERE s.step < 4
         |    GROUP BY s.qid, s.picked, s.step, c.p, c.rel
         |  ) GROUP BY qid, picked, step),
         |fin AS (SELECT qid, picked FROM sel WHERE step = 4),
         |-- stage the unnest in its own CTE: a list-index predicate in
         |-- a LATERAL join after the recursion crashes the planner
         |ex AS (SELECT f.qid, s.i AS sel_rank, f.picked[s.i] AS p
         |       FROM fin f, LATERAL unnest(generate_series(1, len(f.picked))) s(i))
         |SELECT ex.qid, CAST(ex.sel_rank AS BIGINT) AS sel_rank, c.cid,
         |       c.rel AS rel_dot
         |FROM ex JOIN cand c ON c.qid = ex.qid AND c.p = ex.p""".stripMargin,

    // Rocchio replayed: round-1 ranks, per-dimension integer sums of
    // the trunc(x·2^20) grid, round-2 cosine against the summed vector
    "s21_prf" ->
      s"""WITH s1 AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |r1 AS (SELECT qid, cid FROM (
         |         SELECT *, row_number() OVER (PARTITION BY qid
         |           ORDER BY cosine DESC, cid ASC) AS rank FROM s1)
         |       WHERE rank <= 5),
         |qe AS (SELECT r1.qid, g.d,
         |         sum(CAST(trunc(CAST(c.embedding[g.d] AS DOUBLE)*1048576.0) AS BIGINT)) AS sv
         |       FROM r1 JOIN embeddings c ON r1.cid = c.vec_id,
         |            generate_series(1, 64) g(d)
         |       GROUP BY 1, 2),
         |ev AS (SELECT qid, list(sv ORDER BY d) AS ev FROM qe GROUP BY qid),
         |s2 AS (SELECT e.qid, c.vec_id AS cid,
         |         ${cosSql("e.ev", "c.embedding")} AS cosine
         |       FROM embeddings c JOIN ev e ON e.qid <> c.vec_id),
         |r2 AS (SELECT *, row_number() OVER (PARTITION BY qid
         |         ORDER BY cosine DESC, cid ASC) AS rank FROM s2)
         |SELECT r2.qid, r2.cid, r2.cosine, CAST(r2.rank AS INT) AS rank,
         |       r1.cid IS NOT NULL AS was_feedback
         |FROM r2 LEFT JOIN r1 ON r2.qid = r1.qid AND r2.cid = r1.cid
         |WHERE r2.rank <= 5""".stripMargin,

    "s11_knn_label_probe" ->
      s"""WITH l AS (SELECT vec_id, embedding, label FROM embeddings WHERE label IS NOT NULL),
         |scored AS (
         |  SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS cid, c.label AS cl,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM l c JOIN l q ON q.vec_id < 16 AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored),
         |votes AS (SELECT qid, ql, cl, count(*) AS votes FROM r WHERE rank <= 5
         |          GROUP BY qid, ql, cl),
         |p AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, cl ASC) AS vr
         |      FROM votes)
         |SELECT qid, CAST(ql AS BIGINT) AS true_label, CAST(cl AS BIGINT) AS pred_label,
         |       votes, CAST(ql = cl AS BIGINT) AS correct
         |FROM p WHERE vr = 1""".stripMargin,

    "s12_knn_probe_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1")},
         |${ivfAssignSql("qprobe", "rn <= 2", "WHERE e.vec_id < 16")},
         |scored AS (
         |  SELECT q.vec_id AS qid, ql.label AS ql, c.vec_id AS cid, cl.label AS cl,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN qprobe q ON c.cell = q.cell AND q.vec_id <> c.vec_id
         |  JOIN embeddings ql ON ql.vec_id = q.vec_id
         |  JOIN embeddings cl ON cl.vec_id = c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored),
         |votes AS (SELECT qid, ql, cl, count(*) AS votes FROM r WHERE rank <= 5
         |          GROUP BY qid, ql, cl),
         |p AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, cl ASC) AS vr
         |      FROM votes)
         |SELECT qid, CAST(ql AS BIGINT) AS true_label, CAST(cl AS BIGINT) AS pred_label,
         |       votes, CAST(ql = cl AS BIGINT) AS correct
         |FROM p WHERE vr = 1""".stripMargin,

    "s2_ann_lsh" ->
      s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS b FROM embeddings),
         |q AS (SELECT * FROM bk WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM bk c JOIN q ON c.b = q.b AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    "s3_ann_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1")},
         |q AS (SELECT * FROM assigned WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN q ON c.cell = q.cell AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    "s14_filtered_ann" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1", "WHERE e.label % 2 = 0")},
         |${ivfAssignSql("qassign", "rn = 1", "WHERE e.vec_id < 8")},
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN qassign q ON c.cell = q.cell AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    "s6_ann_ivf_nprobe" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1")},
         |${ivfAssignSql("qprobe", "rn <= 2", "WHERE e.vec_id < 8")},
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN qprobe q ON c.cell = q.cell AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    // the s6 pipeline with the label ride-along and the per-pair
    // anchor-label <> candidate-label predicate before the top-k
    "s17_hard_negatives" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1")},
         |${ivfAssignSql("qprobe", "rn <= 2", "WHERE e.vec_id < 8")},
         |lab AS (SELECT vec_id, label FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN qprobe q ON c.cell = q.cell AND q.vec_id <> c.vec_id
         |  JOIN lab ql ON ql.vec_id = q.vec_id
         |  JOIN lab cl ON cl.vec_id = c.vec_id
         |  WHERE ql.label <> cl.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |      FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 5""".stripMargin,

    // approx = the s6 IVF/nprobe pipeline, exact = the s1 brute-force
    // pipeline; recall@3 = hits per query over the ground-truth top-3
    "s9_ivf_recall" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1")},
         |${ivfAssignSql("qprobe", "rn <= 2", "WHERE e.vec_id < 8")},
         |ascored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN qprobe q ON c.cell = q.cell AND q.vec_id <> c.vec_id),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |       FROM ascored),
         |approx AS (SELECT qid, cid FROM ar WHERE rank <= 3),
         |escored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |er AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |       FROM escored),
         |exact AS (SELECT qid, cid FROM er WHERE rank <= 3)
         |SELECT e.qid, CAST(count(a.cid) AS BIGINT) AS n_hit,
         |       count(a.cid) / 3.0 AS recall_at_3
         |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
         |GROUP BY e.qid""".stripMargin,

    "s9b_ivf_recall_grid" ->
      s"""WITH cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |               WHERE vec_id >= 100 AND vec_id < 116),
         |${ivfAssignSql("assigned", "rn = 1")},
         |${ivfAssignSql("qprobe", "rn <= 4", "WHERE e.vec_id < 8")},
         |ascored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM assigned c JOIN qprobe q ON c.cell = q.cell AND q.vec_id <> c.vec_id),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |       FROM ascored),
         |approx AS (SELECT qid, cid FROM ar WHERE rank <= 3),
         |escored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |er AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
         |       FROM escored),
         |exact AS (SELECT qid, cid FROM er WHERE rank <= 3)
         |SELECT e.qid, CAST(count(a.cid) AS BIGINT) AS n_hit,
         |       count(a.cid) / 3.0 AS recall_at_3
         |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
         |GROUP BY e.qid""".stripMargin,

    // per-vector symmetric int8 grid (trunc(x*127/max|x|)), ranking
    // over the quantized vectors, hits vs the full-precision truth
    "s19_int8_recall" ->
      s"""WITH mx AS (SELECT vec_id, embedding,
         |              list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS m
         |            FROM embeddings),
         |qz AS (SELECT vec_id,
         |         [CAST(trunc(CAST(x AS DOUBLE)*127.0/m) AS BIGINT) for x in embedding] AS qv
         |       FROM mx WHERE m > 0.0),
         |ascored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.qv", "c.qv")} AS cosine
         |  FROM qz c JOIN qz q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |approx AS (SELECT qid, cid FROM (
         |             SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY cosine DESC, cid ASC) AS rank FROM ascored)
         |           WHERE rank <= 3),
         |escored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |exact AS (SELECT qid, cid FROM (
         |            SELECT *, row_number() OVER (PARTITION BY qid
         |              ORDER BY cosine DESC, cid ASC) AS rank FROM escored)
         |          WHERE rank <= 3)
         |SELECT e.qid, CAST(count(a.cid) AS BIGINT) AS n_hit
         |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
         |GROUP BY 1""".stripMargin,

    // full-dim ground truth once, one truncated ranking per d; the
    // per-(d, query) hit count is the gated integer
    "s18_dim_truncation_recall" -> {
      def trSql(d: Int) =
        s"""ts$d AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |         ${cosSql(s"q.embedding[1:$d]", s"c.embedding[1:$d]")} AS cosine
           |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 8),
           |tr$d AS (SELECT qid, cid FROM (
           |           SELECT *, row_number() OVER (PARTITION BY qid
           |             ORDER BY cosine DESC, cid ASC) AS rank FROM ts$d)
           |         WHERE rank <= 3),
           |h$d AS (SELECT CAST($d AS BIGINT) AS dim, e.qid,
           |          CAST(count(a.cid) AS BIGINT) AS n_hit
           |        FROM exact e LEFT JOIN tr$d a ON e.qid = a.qid AND e.cid = a.cid
           |        GROUP BY 1, 2)""".stripMargin
      s"""WITH escored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |         ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 8),
         |exact AS (SELECT qid, cid FROM (
         |            SELECT *, row_number() OVER (PARTITION BY qid
         |              ORDER BY cosine DESC, cid ASC) AS rank FROM escored)
         |          WHERE rank <= 3),
         |${Seq(8, 16, 32).map(trSql).mkString(",\n")}
         |SELECT dim, qid, n_hit FROM h8
         |UNION ALL SELECT dim, qid, n_hit FROM h16
         |UNION ALL SELECT dim, qid, n_hit FROM h32""".stripMargin
    },

    "c3_pq_codes" ->
      s"""WITH ${pqCtes()}
         |SELECT vec_id, m, code FROM codes""".stripMargin,

    "s4_ann_pq" ->
      s"""WITH ${pqCtes()},
         |recon AS (SELECT codes.vec_id, flatten(list(sl ORDER BY codes.m)) AS rv
         |          FROM codes JOIN cb ON codes.m = cb.m AND codes.code = cb.c
         |          GROUP BY codes.vec_id HAVING count(*) = 4),
         |scored AS (SELECT q.vec_id AS qid, rc.vec_id AS cid,
         |             ${cosSql("q.embedding", "rc.rv")} AS score
         |           FROM recon rc JOIN embeddings q
         |             ON q.vec_id < 8 AND q.vec_id <> rc.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
         |         ORDER BY score DESC, cid ASC) AS rank FROM scored)
         |SELECT qid, cid, score, rank FROM rk WHERE rank <= 3""".stripMargin,

    // stage 1 = the s4 PQ scorer kept to the kCoarse=12 pool; stage 2
    // re-scores the pool with exact vectors
    "s8_ann_rerank" ->
      s"""WITH ${pqCtes()},
         |recon AS (SELECT codes.vec_id, flatten(list(sl ORDER BY codes.m)) AS rv
         |          FROM codes JOIN cb ON codes.m = cb.m AND codes.code = cb.c
         |          GROUP BY codes.vec_id HAVING count(*) = 4),
         |approx AS (SELECT q.vec_id AS qid, rc.vec_id AS cid,
         |             ${cosSql("q.embedding", "rc.rv")} AS score
         |           FROM recon rc JOIN embeddings q
         |             ON q.vec_id < 8 AND q.vec_id <> rc.vec_id),
         |cand AS (SELECT qid, cid FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |           ORDER BY score DESC, cid ASC) AS rk FROM approx) WHERE rk <= 12),
         |exact AS (SELECT cand.qid, cand.cid,
         |            ${cosSql("q.embedding", "c.embedding")} AS cosine
         |          FROM cand JOIN embeddings q ON q.vec_id = cand.qid
         |                    JOIN embeddings c ON c.vec_id = cand.cid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY cosine DESC, cid ASC) AS rank FROM exact)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    "t1b_basket_last" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "a12_hopping_window" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type, value FROM events),
        |x AS (SELECT time_bucket(INTERVAL 30 MINUTE, t) AS b0, event_type, value FROM e),
        |u AS (SELECT b0 AS bucket, event_type, value FROM x
        |      UNION ALL
        |      SELECT b0 - INTERVAL 30 MINUTE, event_type, value FROM x)
        |SELECT bucket, event_type, count(*) AS n, max(value) AS max_value
        |FROM u GROUP BY bucket, event_type""".stripMargin,

    "a11_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
        |m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |                       OR t - lag(t) OVER w >= INTERVAL 12 HOUR THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                               ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
        |       min(t) AS session_start
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "tx1_token_stats" ->
      """SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
        |       len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "tx2_quality" -> {
      val stopEn = TextFunctions.StopEn.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH b AS (SELECT doc_id, text, string_split(text,' ') AS w, len(text) AS L
         |           FROM documents),
         |c AS (SELECT doc_id,
         |  (L - len(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))*1.0 / greatest(L, 1) AS punct_ratio,
         |  len(list_filter(w, t -> list_contains($stopEn, t)))*1.0 / greatest(len(w), 1) AS stop_ratio,
         |  len(w) AS n_tok,
         |  list_sum([len(t) for t in w])*1.0 / greatest(len(w), 1) AS mean_len
         |  FROM b)
         |SELECT doc_id, punct_ratio, stop_ratio,
         |       0.4*least(n_tok/100.0, 1.0) + 0.3*(1.0 - punct_ratio) +
         |       0.2*stop_ratio + 0.1*least(mean_len/8.0, 1.0) AS quality
         |FROM c""".stripMargin
    },

    "tx9_annotate_bundle" -> {
      def ratio(words: Seq[String]) = {
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(w, t -> list_contains($arr, t)))*1.0 / greatest(len(w), 1)"
      }
      s"""WITH $shingleCtes,
         |shh AS (SELECT doc_id, ${phSql("s")} AS sh FROM sh),
         |rep0 AS (SELECT doc_id, count(DISTINCT sh) AS nd FROM shh GROUP BY doc_id),
         |base AS (SELECT doc_id, text, string_split(text,' ') AS w, len(text) AS L
         |         FROM documents),
         |qc AS (SELECT doc_id,
         |  (L - len(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))*1.0 / greatest(L, 1) AS punct_ratio,
         |  ${ratio(TextFunctions.StopEn)} AS stop_ratio,
         |  len(w) AS n_tok,
         |  list_sum([len(t) for t in w])*1.0 / greatest(len(w), 1) AS mean_len
         |  FROM base),
         |qual AS (SELECT doc_id,
         |        0.4*least(n_tok/100.0, 1.0) + 0.3*(1.0 - punct_ratio) +
         |        0.2*stop_ratio + 0.1*least(mean_len/8.0, 1.0) AS quality FROM qc),
         |lidc AS (SELECT doc_id,
         |  len(regexp_extract_all(text, '[一-鿿]'))*1.0 / greatest(len(text), 1) AS cjk,
         |  ${ratio(TextFunctions.StopEn)} AS s_en, ${ratio(TextFunctions.StopDe)} AS s_de,
         |  ${ratio(TextFunctions.StopFr)} AS s_fr, ${ratio(TextFunctions.StopEs)} AS s_es
         |  FROM base),
         |lid AS (SELECT doc_id,
         |  CASE WHEN cjk > 0.3 THEN 'zh'
         |       WHEN s_en = 0.0 AND s_de = 0.0 AND s_fr = 0.0 AND s_es = 0.0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS lang_detected FROM lidc),
         |rep AS (SELECT base.doc_id,
         |  CASE WHEN len(w) - 2 > 0
         |       THEN 1.0 - CAST(coalesce(nd, 0) AS DOUBLE) / CAST(len(w) - 2 AS DOUBLE)
         |       ELSE 0.0 END AS repetition
         |  FROM base LEFT JOIN rep0 ON base.doc_id = rep0.doc_id)
         |SELECT base.doc_id, len(w) AS n_tokens, qual.quality, lid.lang_detected,
         |       rep.repetition
         |FROM base JOIN qual USING (doc_id) JOIN lid USING (doc_id)
         |JOIN rep USING (doc_id)""".stripMargin
    },

    "tx3_lang_id" -> {
      def ratio(words: Seq[String]) = {
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(w, t -> list_contains($arr, t)))*1.0 / greatest(len(w), 1)"
      }
      s"""WITH b AS (SELECT doc_id, lang, text, string_split(text,' ') AS w FROM documents),
         |c AS (SELECT doc_id, lang,
         |  len(regexp_extract_all(text, '[一-鿿]'))*1.0 / greatest(len(text), 1) AS cjk,
         |  ${ratio(TextFunctions.StopEn)} AS s_en, ${ratio(TextFunctions.StopDe)} AS s_de,
         |  ${ratio(TextFunctions.StopFr)} AS s_fr, ${ratio(TextFunctions.StopEs)} AS s_es
         |  FROM b)
         |SELECT doc_id, lang,
         |  CASE WHEN cjk > 0.3 THEN 'zh'
         |       WHEN s_en = 0.0 AND s_de = 0.0 AND s_fr = 0.0 AND s_es = 0.0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS lang_detected
         |FROM c""".stripMargin
    },

    "tx5_normalize_repetition" ->
      s"""WITH $shingleCtes,
         |shh AS (SELECT doc_id, ${phSql("s")} AS sh FROM sh),
         |d AS (SELECT doc_id, count(DISTINCT sh) AS nd FROM shh GROUP BY doc_id),
         |b AS (SELECT doc_id, text, len(string_split(text,' ')) - 2 AS total FROM documents)
         |SELECT b.doc_id,
         |  trim(regexp_replace(lower(upper(text)), '\\s+', ' ', 'g')) AS norm,
         |  CASE WHEN total > 0
         |       THEN 1.0 - CAST(coalesce(nd, 0) AS DOUBLE) / CAST(total AS DOUBLE)
         |       ELSE 0.0 END AS repetition
         |FROM b LEFT JOIN d ON b.doc_id = d.doc_id""".stripMargin,

    "tx4_fingerprint" ->
      s"""WITH b AS (SELECT doc_id, text, len(text) AS L FROM documents),
         |kh AS (SELECT doc_id,
         |         [${phSql("substr(text, i, 8)")} for i in generate_series(1, L-7)] AS kh
         |       FROM b WHERE L >= 11),
         |f AS (SELECT doc_id,
         |        list_distinct([list_min(kh[j:j+3]) for j in generate_series(1, len(kh)-3)]) AS fps
         |      FROM kh)
         |SELECT doc_id, unnest(fps) AS fp FROM f""".stripMargin,

    // the len(text) > 0 guard matches the Scala stub codec for empty
    // payloads: DuckDB string_split_regex('','') is [''] with
    // unicode('') = -1, which would credit bin 7 where the kernel
    // emits all-zero (ADVICE r4; latent — the corpus has no empties)
    // audio rows carry a REAL WAV payload (44-byte header + one i16
    // sample per codepoint, sample = cp & 7) and image rows a REAL
    // 24-bit BMP (54-byte header + one padded n×1 pixel row, gray =
    // cp & 7), so n_bytes is the file size and the feature is the
    // decoded-sample/pixel histogram — which equals the
    // codepoint-class histogram by construction
    "mm1_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  -- video = RIFF/AVI container size: 100 header/list bytes +
        |  -- per-frame (8 + len + word-align pad) over k = n_chars%32+1
        |  -- frames holding len(text) codepoint-class bytes chunked
        |  -- (first n%k frames one byte longer)
        |  -- image rows: even ids a 24-bit BMP (54-byte header + one
        |  -- padded 3·n pixel row); odd ids an 8-bit gray PNG with
        |  -- STORED deflate blocks (sig 8 + IHDR 25 + IDAT 12 + IEND 12
        |  -- + zlib 2+5·blocks+(n+1)+4 = 64 + n + 5·ceil((n+1)/65535))
        |  CASE WHEN doc_id % 3 = 1 THEN 44 + 2*len(text)
        |       WHEN doc_id % 6 = 0 THEN 54 + ((3*len(text)+3)//4)*4
        |       WHEN doc_id % 6 = 3 THEN 64 + len(text) + 5*((len(text)+65535)//65535)
        |       ELSE 100 + 8*(n_chars % 32 + 1) + len(text)
        |            + (len(text) % (n_chars % 32 + 1))
        |              * ((len(text) // (n_chars % 32 + 1) + 1) % 2)
        |            + ((n_chars % 32 + 1) - (len(text) % (n_chars % 32 + 1)))
        |              * ((len(text) // (n_chars % 32 + 1)) % 2)
        |       END AS n_bytes,
        |  k AS bin,
        |  CASE WHEN len(text) > 0 THEN
        |    len(list_filter(string_split_regex(text,''), c -> (unicode(c) & 7) = k)) * 1.0
        |      / len(text)
        |  ELSE 0.0 END AS value
        |FROM documents, (SELECT unnest(generate_series(0, 7)) AS k)
        |WHERE text IS NOT NULL""".stripMargin,

    // hand-derived: header-only WAV and 0x0 BMP decode to the
    // all-zeros histogram; the SOI+EOI JPEG nulls in the strict
    // decoder and emits NO rows
    "mm9_payload_boundaries" ->
      """WITH m AS (SELECT * FROM (VALUES
        |            (CAST(1 AS BIGINT), 'wav', CAST(44 AS INT)),
        |            (CAST(2 AS BIGINT), 'bmp', CAST(54 AS INT)),
        |            (CAST(4 AS BIGINT), 'png', CAST(57 AS INT)))
        |          AS t(media_id, kind, n_bytes)),
        |b AS (SELECT CAST(unnest(generate_series(0, 7)) AS INT) AS bin)
        |SELECT media_id, kind, n_bytes, bin, CAST(0.0 AS DOUBLE) AS "value"
        |FROM m, b
        |UNION ALL
        |SELECT CAST(5 AS BIGINT), 'png', CAST(75 AS INT),
        |       CAST(v.bin AS INT), CAST(v.val AS DOUBLE)
        |FROM (VALUES (0, 0.0), (1, 0.25), (2, 0.125), (3, 0.0),
        |             (4, 0.125), (5, 0.125), (6, 0.25), (7, 0.125))
        |     AS v(bin, val)""".stripMargin,

    // dispatch fence: the per-fixture route is a pure doc_id/text
    // function (syntheticMedia's when-chain, mjpeg = RIFF container,
    // colorjpeg = JFIF unless empty) — and NO arm ever yields 'stub',
    // so any fixture falling through to stubDecode breaks the counts
    "mm10_dispatch_audit" ->
      """SELECT src, kind, route, count(*) AS n FROM (
        |  SELECT 'synthetic' AS src,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         CASE WHEN text IS NULL THEN 'null'
        |              WHEN doc_id % 3 = 1 THEN 'wav'
        |              WHEN doc_id % 6 = 0 THEN 'bmp'
        |              WHEN doc_id % 6 = 3 THEN 'png'
        |              ELSE 'avi' END AS route
        |  FROM documents
        |  UNION ALL
        |  SELECT 'mjpeg', 'video',
        |         CASE WHEN text IS NULL THEN 'null' ELSE 'avi' END
        |  FROM documents
        |  UNION ALL
        |  SELECT 'colorjpeg', 'image',
        |         CASE WHEN text IS NULL OR len(text) = 0 THEN 'null'
        |              ELSE 'jpeg' END
        |  FROM documents
        |) GROUP BY 1, 2, 3""".stripMargin,

    // MJPEG path: decoded pixels of constant DC-only blocks recover
    // the codepoint classes exactly — one 64-pixel block per
    // codepoint, so the pixel-class shares equal the codepoint-class
    // shares (the raw-AVI histogram expression, 64s cancelling)
    "mm4_mjpeg_pixels" ->
      """SELECT doc_id AS media_id, k AS bin,
        |  CASE WHEN len(text) > 0 THEN
        |    len(list_filter(string_split_regex(text,''), c -> (unicode(c) & 7) = k)) * 1.0
        |      / len(text)
        |  ELSE 0.0 END AS value
        |FROM documents, (SELECT unnest(generate_series(0, 7)) AS k)
        |WHERE text IS NOT NULL""".stripMargin,

    // color fixture: one 16x16 MCU per codepoint (first 256), uniform
    // (y,cb,cr) from codepoint bits; decoded RGB = the same fixed-point
    // JFIF transform in SQL (non-negative products, // = floor = >>16)
    "mm5_color_pixels" ->
      """WITH cps AS (
        |  SELECT doc_id, unicode(c) AS u
        |  FROM (SELECT doc_id, unnest((string_split_regex(text, ''))[1:256]) AS c
        |        FROM documents WHERE text IS NOT NULL AND len(text) > 0)),
        |c AS (SELECT doc_id,
        |        (u & 7) * 16 + 64 AS y,
        |        128 + ((u >> 3) & 3) * 16 AS cb,
        |        128 + ((u >> 5) & 3) * 16 AS cr
        |      FROM cps),
        |rgb AS (SELECT doc_id,
        |          LEAST(255, y + (91881 * (cr - 128)) // 65536) AS r,
        |          GREATEST(0, y - (22554 * (cb - 128) + 46802 * (cr - 128)) // 65536) AS g,
        |          LEAST(255, y + (116130 * (cb - 128)) // 65536) AS b
        |        FROM c)
        |SELECT doc_id AS media_id,
        |       CAST(256 * sum(r) AS BIGINT) AS sum_r,
        |       CAST(256 * sum(g) AS BIGINT) AS sum_g,
        |       CAST(256 * sum(b) AS BIGINT) AS sum_b,
        |       CAST(256 * count(*) AS BIGINT) AS n_px
        |FROM rgb GROUP BY doc_id""".stripMargin,

    "mm2_frame_sample" ->
      """SELECT doc_id AS media_id,
        |       unnest(generate_series(0, (n_chars % 32 + 1) - 1, 4)) AS frame_idx
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    // scene cuts replayed from the fixture's deterministic frame
    // chunking (k = n_chars%32+1 frames, first n%k one byte longer):
    // per-frame 8-class histograms from text slices, consecutive L1
    "mm7_scene_cuts" ->
      """WITH v AS (SELECT doc_id AS media_id, text, len(text) AS n,
        |             n_chars % 32 + 1 AS k
        |           FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL),
        |cl AS (SELECT media_id, n, k,
        |         CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
        |              ELSE [CAST(unicode(c) & 7 AS BIGINT)
        |                    for c in string_split_regex(text, '')] END AS cls
        |       FROM v),
        |fr AS (SELECT media_id, f,
        |         [CAST(len(list_filter(
        |            cls[f*(n//k) + least(f, n%k) + 1 :
        |                f*(n//k) + least(f, n%k) + n//k
        |                  + CASE WHEN f < n%k THEN 1 ELSE 0 END],
        |            x -> x = cc)) AS BIGINT)
        |          for cc in [0, 1, 2, 3, 4, 5, 6, 7]] AS h
        |       FROM cl, LATERAL unnest(generate_series(0, k-1)) s(f)),
        |p AS (SELECT a.media_id, a.f,
        |        CAST(list_sum([abs(a.h[i] - b.h[i])
        |                       for i in generate_series(1, 8)]) AS BIGINT) AS l1,
        |        CAST(list_sum(a.h) + list_sum(b.h) AS BIGINT) AS mass
        |      FROM fr a JOIN fr b ON a.media_id = b.media_id AND a.f = b.f + 1),
        |agg AS (SELECT media_id,
        |          CAST(count(*) FILTER (WHERE mass > 0 AND l1*1000 > 500*mass)
        |               AS BIGINT) AS n_cuts,
        |          CAST(coalesce(max(CASE WHEN mass > 0 THEN l1*1000 // mass
        |                             ELSE 0 END), 0) AS BIGINT) AS max_l1_milli,
        |          min(CASE WHEN mass > 0 AND l1*1000 > 500*mass THEN f END)
        |            AS first_cut_frame
        |        FROM p GROUP BY 1)
        |SELECT v.media_id, CAST(v.k AS BIGINT) AS n_frames,
        |       coalesce(agg.n_cuts, 0) AS n_cuts,
        |       coalesce(agg.max_l1_milli, 0) AS max_l1_milli,
        |       agg.first_cut_frame
        |FROM v LEFT JOIN agg USING (media_id)""".stripMargin,

    // aHash replayed from the fixture's gray = cp & 7 pixels: 64
    // floor-spaced samples, integer mean-compare bits summed as
    // disjoint powers of two (two's-complement sum == the OR packing,
    // bit 63 included)
    "mm8_image_ahash" ->
      """WITH v AS (SELECT doc_id AS media_id, text, len(text) AS n
        |           FROM documents
        |           WHERE doc_id % 6 = 0 AND text IS NOT NULL AND len(text) > 0),
        |cl AS (SELECT media_id, n,
        |         [CAST(unicode(c) & 7 AS BIGINT)
        |          for c in string_split_regex(text, '')] AS cls
        |       FROM v),
        |sm AS (SELECT media_id, n,
        |         [cls[(j*n)//64 + 1] for j in generate_series(0, 63)] AS s
        |       FROM cl),
        |h0 AS (SELECT media_id, CAST(n AS BIGINT) AS n_px,
        |         list_sum([CASE WHEN s[j+1]*64 > list_sum(s)
        |                   THEN 1::HUGEINT << j ELSE 0::HUGEINT END
        |                   for j in generate_series(0, 63)]) AS u
        |       FROM sm),
        |-- wrap the unsigned 64-bit mass to the signed long the engine
        |-- packs (1::BIGINT << 63 overflows DuckDB's checked shift)
        |hh AS (SELECT media_id, n_px,
        |         CAST(CASE WHEN u >= 9223372036854775808
        |              THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS ahash
        |       FROM h0),
        |g AS (SELECT ahash, CAST(count(*) AS BIGINT) AS group_size
        |      FROM hh GROUP BY 1)
        |SELECT hh.media_id, hh.ahash, hh.n_px, g.group_size
        |FROM hh JOIN g USING (ahash)""".stripMargin,

    // audio segmentation replayed from the fixture construction
    // (samples = cp & 7 per codepoint): 4-sample frame energies,
    // silent-run islands by the gaps-and-islands trick. The len>0
    // guard mirrors mm1's (string_split_regex('','') is [''] with
    // unicode -1)
    "mm6_audio_segments" ->
      """WITH a AS (SELECT doc_id AS media_id,
        |    CASE WHEN len(text) = 0 THEN CAST([] AS BIGINT[])
        |         ELSE [CAST(unicode(c) & 7 AS BIGINT)
        |               for c in string_split_regex(text, '')] END AS sm
        |  FROM documents WHERE doc_id % 3 = 1 AND text IS NOT NULL),
        |f AS (SELECT media_id, i AS fidx,
        |        list_sum(sm[(i-1)*4+1 : least(i*4, len(sm))]) AS fe
        |      FROM a, LATERAL unnest(generate_series(1, (len(sm)+3)//4)) s(i)),
        |si AS (SELECT media_id, fidx,
        |         fidx - row_number() OVER (PARTITION BY media_id ORDER BY fidx) AS g
        |       FROM f WHERE fe = 0),
        |runs AS (SELECT media_id, CAST(max(cnt) AS BIGINT) AS max_run
        |         FROM (SELECT media_id, g, count(*) AS cnt FROM si GROUP BY 1, 2)
        |         GROUP BY 1),
        |agg AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
        |          CAST(sum(CASE WHEN fe = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
        |          CAST(max(fe) AS BIGINT) AS max_frame_energy,
        |          CAST(sum(fe) AS BIGINT) AS total_energy
        |        FROM f GROUP BY 1)
        |SELECT a.media_id, CAST(len(sm) AS BIGINT) AS n_samples,
        |       coalesce(agg.n_frames, 0) AS n_frames,
        |       coalesce(agg.n_silent, 0) AS n_silent,
        |       coalesce(agg.max_frame_energy, 0) AS max_frame_energy,
        |       coalesce(runs.max_run, 0) AS longest_silent_run,
        |       coalesce(agg.total_energy, 0) AS total_energy
        |FROM a LEFT JOIN agg USING (media_id)
        |       LEFT JOIN runs USING (media_id)""".stripMargin,

    // empty docs decode to the kernel's all-zero feature — zero-norm,
    // NaN cosine against everything — and are excluded on both sides
    // (the engine filters exists(feature, v != 0); here len(text) > 0
    // is the same set, since any non-empty histogram sums to 1)
    "mm3_media_similarity" ->
      s"""WITH f AS (SELECT doc_id AS media_id,
         |  list_transform(generate_series(0, 7), k ->
         |    len(list_filter(string_split_regex(text,''), c -> (unicode(c) & 7) = k)) * 1.0
         |      / len(text)) AS feature
         |  FROM documents WHERE text IS NOT NULL AND len(text) > 0),
         |scored AS (SELECT q.media_id AS qid, c.media_id AS cid,
         |             ${cosSql("q.feature", "c.feature")} AS cosine
         |           FROM f c JOIN f q ON q.media_id < 6 AND q.media_id <> c.media_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY cosine DESC, cid ASC) AS rank FROM scored)
         |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    "d8_decontaminate" -> {
      val gram5 = "w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]"
      s"""WITH bt AS (SELECT string_split(text,' ') AS w FROM documents WHERE doc_id % 37 = 0),
         |bg AS (SELECT unnest(generate_series(1, len(w)-4)) AS i, w FROM bt),
         |bs AS (SELECT DISTINCT $gram5 AS s FROM bg),
         |bh AS (SELECT DISTINCT ${phSql("s")} AS sh FROM bs),
         |ct AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id % 37 <> 0),
         |cg AS (SELECT doc_id, unnest(generate_series(1, len(w)-4)) AS i, w FROM ct),
         |cs AS (SELECT DISTINCT doc_id, $gram5 AS s FROM cg),
         |ch AS (SELECT DISTINCT doc_id, ${phSql("s")} AS sh FROM cs)
         |SELECT doc_id, count(*) AS n_overlap
         |FROM ch JOIN bh USING (sh) GROUP BY doc_id""".stripMargin
    },

    "d8b_decontaminated" -> {
      val gram5 = "w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]"
      s"""WITH bt AS (SELECT string_split(text,' ') AS w FROM documents WHERE doc_id % 37 = 0),
         |bg AS (SELECT unnest(generate_series(1, len(w)-4)) AS i, w FROM bt),
         |bs AS (SELECT DISTINCT $gram5 AS s FROM bg),
         |bh AS (SELECT DISTINCT ${phSql("s")} AS sh FROM bs),
         |ct AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id % 37 <> 0),
         |cg AS (SELECT doc_id, unnest(generate_series(1, len(w)-4)) AS i, w FROM ct),
         |cs AS (SELECT DISTINCT doc_id, $gram5 AS s FROM cg),
         |ch AS (SELECT DISTINCT doc_id, ${phSql("s")} AS sh FROM cs),
         |bad AS (SELECT DISTINCT doc_id FROM ch JOIN bh USING (sh))
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id % 37 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin
    },

    // boilerplate decision rides the same polyHash as the engine; the
    // hash is internal (df counting + membership), never output
    "d14_line_dedup" ->
      s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents
         |           WHERE text IS NOT NULL),
         |l AS (SELECT doc_id, i, array_to_string(w[(i-1)*8+1:(i-1)*8+8], ' ') AS line
         |      FROM w, LATERAL unnest(generate_series(1, (len(w)+7)//8)) AS t(i)),
         |lh AS (SELECT doc_id, i, line, ${phSql("line")} AS lh FROM l),
         |boiler AS (SELECT lh FROM lh GROUP BY lh HAVING count(DISTINCT doc_id) >= 2),
         |kept AS (SELECT * FROM lh WHERE lh NOT IN (SELECT lh FROM boiler)),
         |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS clean_text,
         |               count(*) AS n_kept
         |        FROM kept GROUP BY doc_id),
         |base AS (SELECT doc_id, (len(string_split(text,' '))+7)//8 AS n_lines
         |         FROM documents WHERE text IS NOT NULL)
         |SELECT b.doc_id, coalesce(r.clean_text,'') AS clean_text, b.n_lines,
         |       b.n_lines - coalesce(r.n_kept,0) AS n_removed
         |FROM base b LEFT JOIN reb r ON b.doc_id = r.doc_id""".stripMargin,

    "tx10_perplexity_buckets" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT doc_id, lang, unnest(generate_series(1, len(w)-1)) AS i, w
        |      FROM t WHERE len(w) >= 2),
        |gh AS (SELECT doc_id, lang,
        |         list_reduce([CAST(unicode(c) AS BIGINT) for c in string_split_regex(w[i]||' '||w[i+1],'')],
        |                     (h,c) -> (h*31+c) % 1000000007) AS h FROM g),
        |sc AS (SELECT doc_id, lang,
        |         sum(((h % 1024) * 1103515245 + 12345) % 12000) AS s, count(*) AS n
        |       FROM gh GROUP BY doc_id, lang),
        |scored AS (SELECT doc_id, lang, CAST(s // n AS BIGINT) AS nll_milli FROM sc),
        |hist AS (SELECT lang, nll_milli, count(*) AS c FROM scored GROUP BY 1, 2),
        |cum AS (SELECT lang, nll_milli,
        |          sum(c) OVER (PARTITION BY lang ORDER BY nll_milli ASC) AS cumc,
        |          sum(c) OVER (PARTITION BY lang) AS ntot FROM hist),
        |thr AS (SELECT lang,
        |          min(CASE WHEN cumc >= greatest(ntot*33//100, 1) THEN nll_milli END) AS t1,
        |          min(CASE WHEN cumc >= greatest(ntot*67//100, 1) THEN nll_milli END) AS t2
        |        FROM cum GROUP BY lang)
        |SELECT doc_id, scored.lang, nll_milli,
        |  CASE WHEN nll_milli <= t1 THEN 'head'
        |       WHEN nll_milli <= t2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM scored JOIN thr USING (lang)""".stripMargin,

    "d8c_bloom_decontaminated" -> {
      val gram5 = "w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]"
      val m = BloomM
      val h = BloomM / 2
      // Bloom membership == probe-position-set membership (a bit is
      // set iff SOME bench gram probed it), so the oracle tests the
      // position set directly instead of packing 64-bit words — the
      // identical Kirsch–Mitzenmacher arithmetic, m=2^20, k=4
      s"""WITH bt AS (SELECT string_split(text,' ') AS w FROM documents WHERE doc_id % 37 = 0),
         |bg AS (SELECT unnest(generate_series(1, len(w)-4)) AS i, w FROM bt),
         |bs AS (SELECT DISTINCT $gram5 AS s FROM bg),
         |bh AS (SELECT DISTINCT ${phSql("s")} AS sh FROM bs),
         |js AS (SELECT unnest(generate_series(0, 3)) AS j),
         |bpos AS (SELECT DISTINCT ((sh % $m) + j * (2*((sh * 2654435761 % 1000000007) % $h) + 1)) % $m AS pos
         |         FROM bh CROSS JOIN js),
         |ct AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE doc_id % 37 <> 0),
         |cg AS (SELECT doc_id, unnest(generate_series(1, len(w)-4)) AS i, w FROM ct),
         |cs AS (SELECT DISTINCT doc_id, $gram5 AS s FROM cg),
         |ch AS (SELECT DISTINCT doc_id, ${phSql("s")} AS sh FROM cs),
         |cp AS (SELECT doc_id, sh, ((sh % $m) + j * (2*((sh * 2654435761 % 1000000007) % $h) + 1)) % $m AS pos
         |       FROM ch CROSS JOIN js),
         |hit AS (SELECT doc_id, sh FROM cp JOIN bpos USING (pos)
         |        GROUP BY doc_id, sh HAVING count(*) = 4),
         |bad AS (SELECT DISTINCT doc_id FROM hit)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id % 37 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin
    },

    "st3_source_overlap" ->
      s"""WITH $shingleCtes,
         |hs AS (SELECT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM hs GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT id1, id2, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON id1 = a.doc_id JOIN sig b ON id2 = b.doc_id),
         |p AS (SELECT id1, id2, est_jaccard FROM est WHERE est_jaccard >= 0.5)
         |SELECT least(sa.source, sb.source) AS source_a,
         |       greatest(sa.source, sb.source) AS source_b,
         |       count(*) AS n_pairs, sum(est_jaccard) AS sum_est
         |FROM p JOIN documents sa ON id1 = sa.doc_id
         |       JOIN documents sb ON id2 = sb.doc_id
         |GROUP BY 1, 2""".stripMargin,

    // exact tier: sketch set algebra == DISTINCT set arithmetic
    "st10_vocab_overlap" ->
      """WITH t AS (SELECT source, string_split(text,' ') AS w FROM documents),
        |g AS (SELECT source, unnest(generate_series(1, len(w)-1)) AS i, w
        |      FROM t WHERE len(w) >= 2),
        |bi AS (SELECT source,
        |         list_reduce([CAST(unicode(c) AS BIGINT) for c in string_split_regex(w[i]||' '||w[i+1],'')],
        |                     (h,c) -> (h*31+c) % 1000000007) AS gh FROM g),
        |dv AS (SELECT DISTINCT source, gh FROM bi),
        |v AS (SELECT source, count(*) AS v FROM dv GROUP BY 1),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS vi
        |          FROM dv a JOIN dv b ON a.gh = b.gh AND a.source < b.source
        |          GROUP BY 1, 2),
        |pairs AS (SELECT va.source AS src_a, vb.source AS src_b,
        |            va.v AS v_a, vb.v AS v_b
        |          FROM v va JOIN v vb ON va.source < vb.source)
        |SELECT p.src_a, p.src_b, p.v_a, p.v_b,
        |       p.v_a + p.v_b - coalesce(i.vi, 0) AS v_union,
        |       coalesce(i.vi, 0) AS v_intersect
        |FROM pairs p LEFT JOIN inter i
        |  ON p.src_a = i.src_a AND p.src_b = i.src_b""".stripMargin,

    // exact lower quantile by rank pick — the sketch's under-capacity
    // tier; floor(q*(n-1)) is the same double expression both sides
    "st4_quantile_sketch" ->
      """WITH o AS (SELECT lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM documents)
        |SELECT lang,
        |  max(CASE WHEN rn = CAST(floor(0.5*(n-1)) AS BIGINT) THEN n_chars END) AS p50,
        |  max(CASE WHEN rn = CAST(floor(0.9*(n-1)) AS BIGINT) THEN n_chars END) AS p90,
        |  count(*) AS n_docs
        |FROM o GROUP BY lang""".stripMargin,

    // compaction must be content-neutral: the read-back equals the table
    "z5_partition_skew" ->
      """WITH g AS (SELECT least(l_orderkey % 8, 3) AS bucket,
        |                  count(*) AS n_rows FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n_rows) AS tot, count(*) AS np FROM g)
        |SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows,
        |       (n_rows * np * 10 > tot * 15) AS skewed
        |FROM g CROSS JOIN t""".stripMargin,

    "z4_file_stats" ->
      """SELECT l_orderkey % 4 AS bucket, count(*) AS n_rows,
        |       min(l_orderkey) AS min_v, max(l_orderkey) AS max_v
        |FROM lineitem GROUP BY 1""".stripMargin,

    // one file per bucket by construction, so the next-fit bin cut
    // replays from the logical bucket sizes
    "z6_compaction_plan" ->
      """WITH b AS (SELECT l_orderkey % 8 AS bucket, count(*) AS n_rows,
        |             min(l_orderkey) AS min_v
        |           FROM lineitem GROUP BY 1),
        |c AS (SELECT *, sum(n_rows) OVER (ORDER BY n_rows DESC, min_v ASC) AS cum
        |      FROM b),
        |g AS (SELECT *, CAST((cum - n_rows) // 20000 AS BIGINT) AS grp FROM c)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(n_rows) AS BIGINT) AS total_rows, min(min_v) AS min_v
        |FROM g GROUP BY 1""".stripMargin,

    // z-value interleave replayed (the z1 CTEs), then both layouts'
    // per-bucket [min,max] for BOTH columns probed as in z7
    "z8_zorder_skipping" -> z8OracleSql,

    // the advisor arithmetic over the replayed z8 audit: per-column
    // re-aggregation, CASE-literal workload weights, integer score,
    // min-name tie break
    "z9_layout_advisor" ->
      s"""WITH audit AS (SELECT * FROM ($z8OracleSql)),
         |pc AS (SELECT layout, "column",
         |         CAST(sum(n_files) AS BIGINT) AS col_files,
         |         CAST(sum(n_candidates) AS BIGINT) AS col_candidates
         |       FROM audit GROUP BY 1, 2),
         |pm AS (SELECT *,
         |         CAST((col_files - col_candidates) * 1000 // col_files AS BIGINT)
         |           AS col_skip_milli,
         |         CAST(CASE "column" WHEN 'l_partkey' THEN 600
         |              WHEN 'l_suppkey' THEN 400 ELSE 0 END AS BIGINT) AS weight_pm
         |       FROM pc),
         |sc AS (SELECT layout,
         |         CAST(sum(weight_pm * col_skip_milli) // 1000 AS BIGINT)
         |           AS score_milli
         |       FROM pm GROUP BY 1),
         |win AS (SELECT min(layout) AS w FROM sc
         |        WHERE score_milli = (SELECT max(score_milli) FROM sc))
         |SELECT pm.layout, pm."column", pm.col_files, pm.col_candidates,
         |       pm.col_skip_milli, pm.weight_pm, sc.score_milli,
         |       pm.layout = win.w AS chosen
         |FROM pm JOIN sc ON pm.layout = sc.layout, win""".stripMargin,

    // one file per bucket by construction, so each file's [min,max]
    // replays as the per-bucket min/max of the logical table
    "z7_skipping_audit" ->
      """WITH mx AS (SELECT max(l_orderkey) AS m FROM lineitem),
        |p AS (SELECT DISTINCT (m*(2*i+1))//16 AS probe
        |      FROM mx, LATERAL unnest(generate_series(0,7)) s(i)),
        |h AS (SELECT l_orderkey % 8 AS b, min(l_orderkey) AS mn,
        |             max(l_orderkey) AS mxv FROM lineitem GROUP BY 1),
        |r AS (SELECT least(7, l_orderkey*8 // (m+1)) AS b,
        |             min(l_orderkey) AS mn, max(l_orderkey) AS mxv
        |      FROM lineitem, mx GROUP BY 1),
        |hc AS (SELECT 'hash' AS layout, probe,
        |         CAST(count(*) AS BIGINT) AS n_files,
        |         CAST(sum(CASE WHEN mn <= probe AND probe <= mxv
        |              THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates
        |       FROM p, h GROUP BY 1,2),
        |rc AS (SELECT 'range' AS layout, probe,
        |         CAST(count(*) AS BIGINT) AS n_files,
        |         CAST(sum(CASE WHEN mn <= probe AND probe <= mxv
        |              THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates
        |       FROM p, r GROUP BY 1,2),
        |u AS (SELECT * FROM hc UNION ALL SELECT * FROM rc)
        |SELECT layout, probe, n_files, n_candidates,
        |       CAST((n_files - n_candidates) * 1000 // n_files AS BIGINT)
        |         AS skip_milli
        |FROM u""".stripMargin,

    "z3_compacted_corpus" ->
      "SELECT doc_id, source, n_chars FROM documents",

    // the upsert merge oracle: base rows with src1-even texts
    // corrected in place, plus the late-addition rows — last-writer-
    // wins per doc_id reproduced declaratively
    "z2_partition_upsert" ->
      """WITH final AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE WHEN source = 'src1' AND doc_id % 2 = 0
        |              THEN text || ' [v2]' ELSE text END AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, source, n_chars, text || ' [new]'
        |  FROM documents WHERE source = 'src1' AND doc_id % 5 = 0
        |)
        |SELECT doc_id, source, n_chars, len(text) AS text_len FROM final""".stripMargin,

    // z-key parity: same shift-quantize (no division anywhere — shifts
    // are exact in every engine) and the same interleave positions,
    // generated by the mirror of Layout.zValue's loop
    "z1_zorder_key" -> {
      val zTerms = (0 until 8).flatMap(i => Seq(
        s"(((qp >> $i) & 1) << ${2 * i + 1})",
        s"(((qs >> $i) & 1) << ${2 * i})")).mkString(" + ")
      s"""WITH mm AS (SELECT CAST(min(l_partkey) AS BIGINT) AS pmin,
         |  CAST(max(l_partkey) AS BIGINT) AS pmax,
         |  CAST(min(l_suppkey) AS BIGINT) AS smin,
         |  CAST(max(l_suppkey) AS BIGINT) AS smax FROM lineitem),
         |shft AS (SELECT *,
         |  CASE WHEN pmax = pmin THEN 0 ELSE length(bin(pmax - pmin)) END AS psh,
         |  CASE WHEN smax = smin THEN 0 ELSE length(bin(smax - smin)) END AS ssh
         |  FROM mm),
         |q AS (SELECT l_orderkey, l_linenumber,
         |  ((CAST(l_partkey AS BIGINT) - pmin) << 8) >> psh AS qp,
         |  ((CAST(l_suppkey AS BIGINT) - smin) << 8) >> ssh AS qs
         |  FROM lineitem, shft)
         |SELECT l_orderkey, l_linenumber, qp, qs, $zTerms AS z FROM q""".stripMargin
    },

    // the bucketed layout changes the PLAN (no join exchange), never
    // the answer — the oracle is the plain join
    "b1_bucketed_join" ->
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "tx6_pii_redact" ->
      s"""WITH p AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |  '@mail.com or call +1 555 ' || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS pt
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(pt, '${TextFunctions.EmailRe}')) AS n_emails,
         |  len(regexp_extract_all(regexp_replace(pt, '${TextFunctions.EmailRe}', '[EMAIL]', 'g'),
         |      '${TextFunctions.PhoneRe}')) AS n_phones,
         |  regexp_replace(regexp_replace(pt, '${TextFunctions.EmailRe}', '[EMAIL]', 'g'),
         |      '${TextFunctions.PhoneRe}', '[PHONE]', 'g') AS redacted
         |FROM p""".stripMargin,

    "p1_hash_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 10""".stripMargin,

    "p3_mixture_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${phSql("CAST(doc_id AS VARCHAR)")} % 100 <
         |  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'fr' THEN 10 ELSE 5 END""".stripMargin,

    "p15_temperature_mix" ->
      s"""WITH tot AS (SELECT source, sum(len(string_split(text,' '))) AS total
         |             FROM documents GROUP BY source),
         |w AS (SELECT source, CAST(floor(sqrt(CAST(coalesce(total, 0) AS DOUBLE))) AS BIGINT) AS isq
         |      FROM tot),
         |s AS (SELECT sum(isq) AS sumisq FROM w),
         |pm AS (SELECT source,
         |         CASE WHEN isq * sumisq = 0 THEN 1000
         |              ELSE least(1000, 3000 * 1000 // (isq * sumisq)) END AS pm
         |       FROM w, s)
         |SELECT doc_id, source FROM documents JOIN pm USING (source)
         |WHERE ${phSql("CAST(doc_id AS VARCHAR)")} % 1000 < pm""".stripMargin,

    // p15's pipeline over the 7:2:1 constructed strata — rates differ
    // per stratum, so the `=== s` dispatch is load-bearing
    "p15b_temperature_mix_skew" ->
      s"""WITH d AS (SELECT doc_id, text,
         |             CASE WHEN doc_id % 10 < 7 THEN 'big'
         |                  WHEN doc_id % 10 < 9 THEN 'mid'
         |                  ELSE 'small' END AS stratum
         |           FROM documents),
         |tot AS (SELECT stratum, sum(len(string_split(text,' '))) AS total
         |        FROM d GROUP BY stratum),
         |w AS (SELECT stratum, CAST(floor(sqrt(CAST(coalesce(total, 0) AS DOUBLE))) AS BIGINT) AS isq
         |      FROM tot),
         |s AS (SELECT sum(isq) AS sumisq FROM w),
         |pm AS (SELECT stratum,
         |         CASE WHEN isq * sumisq = 0 THEN 1000
         |              ELSE least(1000, 12000 * 1000 // (isq * sumisq)) END AS pm
         |       FROM w, s)
         |SELECT doc_id, stratum FROM d JOIN pm USING (stratum)
         |WHERE ${phSql("CAST(doc_id AS VARCHAR)")} % 1000 < pm""".stripMargin,

    "st9_countmin" ->
      """SELECT t AS token, count(*) AS est_count
        |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |WHERE t IN ('scan', 'column', 'window', 'sort', 'value')
        |GROUP BY t""".stripMargin,

    "p18_stratified_quota" ->
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |t AS (SELECT count(*) AS tot FROM documents),
         |q AS (SELECT source, (400 * n) // tot AS quota FROM c CROSS JOIN t),
         |r AS (SELECT source, doc_id,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY ${phSql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
         |      FROM documents)
         |SELECT source, rn AS rank, doc_id
         |FROM r JOIN q USING (source) WHERE rn <= quota""".stripMargin,

    "p17_bottomk_sample" ->
      s"""SELECT source, CAST(rn AS INT) AS rank, doc_id FROM (
         |  SELECT source, doc_id,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ${phSql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
         |  FROM documents) WHERE rn <= 20""".stripMargin,

    "p11_token_budget" ->
      s"""WITH tot AS (SELECT source, sum(len(string_split(text,' '))) AS total
         |             FROM documents GROUP BY source),
         |pm AS (SELECT source, least(1000,
         |         (CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400
         |               WHEN 'src2' THEN 1000000 ELSE 600 END) * 1000
         |           // greatest(total, 1)) AS pm
         |       FROM tot)
         |SELECT doc_id, source FROM documents JOIN pm USING (source)
         |WHERE ${phSql("CAST(doc_id AS VARCHAR)")} % 1000 < pm""".stripMargin,

    "p4_upsample" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 150 WHEN 'fr' THEN 100
         |       ELSE 50 END AS pct,
         |  ${phSql("CAST(doc_id AS VARCHAR)")} % 100 AS h FROM documents),
         |c AS (SELECT doc_id, lang,
         |  pct // 100 + CASE WHEN h < pct % 100 THEN 1 ELSE 0 END AS n FROM b)
         |SELECT doc_id, lang, unnest(generate_series(1, n)) AS copy
         |FROM c WHERE n > 0""".stripMargin,

    // natural shares + literal targets, integer interpolation per epoch
    "p28_mixture_schedule" ->
      """WITH n AS (SELECT lang,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
        |           FROM documents GROUP BY lang),
        |tt AS (SELECT CAST(sum(tok) AS BIGINT) AS tot FROM n),
        |tg AS (SELECT * FROM (VALUES ('en', 500), ('de', 200), ('fr', 200),
        |                             ('zh', 100)) t(lang, target_pm)),
        |sh AS (SELECT coalesce(n.lang, tg.lang) AS lang,
        |         CAST(coalesce(n.tok * 1000 // greatest(tt.tot, 1), 0) AS BIGINT)
        |           AS natural_pm,
        |         CAST(coalesce(tg.target_pm, 0) AS BIGINT) AS target_pm
        |       FROM n FULL JOIN tg ON n.lang = tg.lang, tt)
        |SELECT CAST(e.epoch AS BIGINT) AS epoch, sh.lang, sh.natural_pm,
        |       sh.target_pm,
        |       CAST(sh.natural_pm + (sh.target_pm - sh.natural_pm) * e.epoch // 3
        |            AS BIGINT) AS weight_pm,
        |       CAST(100000 * (sh.natural_pm + (sh.target_pm - sh.natural_pm)
        |            * e.epoch // 3) // 1000 AS BIGINT) AS planned_tokens
        |FROM sh, LATERAL unnest(generate_series(0, 3)) e(epoch)""".stripMargin,

    // explicit discrete quantiles (smallest v with cum·k >= q·n) so no
    // engine quantile variant is trusted
    "p27_corpus_card" ->
      """WITH b AS (SELECT doc_id, text, lang, source,
        |    CASE WHEN text IS NOT NULL
        |         THEN CAST(len(string_split(text, ' ')) AS BIGINT) END AS nt
        |  FROM documents),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(coalesce(sum(nt), 0) AS BIGINT) AS n_tokens,
        |        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |        CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_null_texts,
        |        CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts
        |      FROM b),
        |h AS (SELECT nt, count(*) AS c FROM b WHERE nt IS NOT NULL GROUP BY nt),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b WHERE nt IS NOT NULL),
        |cq AS (SELECT nt, sum(c) OVER (ORDER BY nt ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM h),
        |q AS (SELECT min(CASE WHEN cum * 2 >= nn THEN nt END) AS median_doc_tokens,
        |             min(CASE WHEN cum * 10 >= nn * 9 THEN nt END) AS p90_doc_tokens
        |      FROM cq, n)
        |SELECT n_docs, n_tokens, n_langs, n_sources, n_null_texts, distinct_texts,
        |       CAST((n_docs - n_null_texts - distinct_texts) * 1000 //
        |            greatest(n_docs - n_null_texts, 1) AS BIGINT) AS dup_doc_milli,
        |       median_doc_tokens, p90_doc_tokens
        |FROM t, q""".stripMargin,

    // quadratic epoch mix replayed (h·((h + A·e) mod P) mod P — see
    // Curation.epochMix for why suffix/linear mixes fail); epoch = 2
    "p5_shuffle_order" ->
      s"""WITH b0 AS (SELECT doc_id,
         |  ${phSql("CAST(doc_id AS VARCHAR)")} AS s FROM documents),
         |b AS (SELECT doc_id, (s * ((s + 2 * 2654435761) % $P)) % $P AS h FROM b0)
         |SELECT doc_id, h % 8 AS shard,
         |       row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
         |FROM b""".stripMargin,

    // curriculum replayed: stable id-hash shard, per-shard order by
    // (difficulty, epoch-mixed hash, id); epoch = 1
    "p26_curriculum" ->
      s"""WITH b0 AS (SELECT doc_id, n_chars // 50 AS difficulty,
         |  ${phSql("CAST(doc_id AS VARCHAR)")} AS s FROM documents),
         |b AS (SELECT doc_id, difficulty, s % 8 AS shard,
         |        (s * ((s + 2654435761) % $P)) % $P AS h FROM b0)
         |SELECT doc_id, difficulty, shard,
         |       row_number() OVER (PARTITION BY shard
         |         ORDER BY difficulty, h, doc_id) AS pos
         |FROM b""".stripMargin,

    "tx7_gopher_filter" -> {
      val stopEn = TextFunctions.StopEn.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH b AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |c AS (SELECT doc_id, len(w) AS n_words,
         |  list_sum([len(t) for t in w])*1.0 / greatest(len(w), 1) AS mean_word_len,
         |  len(list_distinct(w))*1.0 / greatest(len(w), 1) AS frac_unique_words,
         |  len(list_filter(w, t -> list_contains($stopEn, t))) AS n_stop_hits
         |  FROM b)
         |SELECT doc_id, n_words, mean_word_len, frac_unique_words, n_stop_hits,
         |  (n_words >= 50 AND n_words <= 100000
         |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |   AND n_stop_hits >= 2 AND frac_unique_words >= 0.2) AS keep
         |FROM c""".stripMargin
    },

    "c1_kmeans" ->
      s"""WITH ${kmeansCtes()}
         |SELECT vec_id, cell FROM a1""".stripMargin,

    "c1b_kmeans_iter2" ->
      s"""WITH ${kmeansCtes(iters = 2)}
         |SELECT vec_id, cell FROM a2""".stripMargin,

    "c6_centroid_outliers" ->
      s"""WITH ${StubQuantizer.sql},
         |scored AS (SELECT e.vec_id, cents.c,
         |    list_dot_product(CAST(e.embedding AS DOUBLE[]), ce) /
         |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(ce, ce))) AS cos
         |  FROM embeddings e CROSS JOIN cents),
         |best AS (SELECT vec_id, c AS cell, cos,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c ASC) AS rn
         |         FROM scored WHERE NOT isnan(cos))
         |SELECT vec_id, cell, cos AS cos_to_centroid
         |FROM best WHERE rn = 1 AND cos < 0.08""".stripMargin,

    // rank window replays the struct-max tie-break (s DESC, c ASC);
    // every gated value is an exact integer — no float trunc anywhere
    "c7_assignment_margin" ->
      s"""WITH ${StubQuantizer.qsql},
         |e AS (SELECT vec_id,
         |        [CAST(trunc(CAST(x AS DOUBLE)*1024.0) AS BIGINT) FOR x IN embedding] AS qv
         |      FROM embeddings WHERE embedding IS NOT NULL),
         |scored AS (SELECT vec_id, c,
         |             CAST(list_dot_product(qv, qce) AS BIGINT) AS s
         |           FROM e CROSS JOIN qcents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |        ORDER BY s DESC, c ASC) AS rn FROM scored),
         |own AS (SELECT vec_id, c AS cell, s AS own FROM r WHERE rn = 1 AND s > 0),
         |sec AS (SELECT vec_id, s AS sec FROM r WHERE rn = 2),
         |m AS (SELECT cell, (own - sec)*1000//own AS rel
         |      FROM own JOIN sec USING (vec_id))
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(rel) AS BIGINT) AS min_margin_milli,
         |       CAST(sum(rel)//count(*) AS BIGINT) AS mean_margin_milli
         |FROM m GROUP BY 1""".stripMargin,

    "c5_cluster_purity" ->
      s"""WITH ${kmeansCtes()},
         |lab AS (SELECT a1.vec_id, a1.cell, e.label FROM a1
         |        JOIN embeddings e ON a1.vec_id = e.vec_id
         |        WHERE e.label IS NOT NULL),
         |counts AS (SELECT cell, label, count(*) AS c FROM lab GROUP BY cell, label),
         |tot AS (SELECT cell, sum(c) AS n FROM counts GROUP BY cell),
         |top AS (SELECT *, row_number() OVER (PARTITION BY cell
         |                                     ORDER BY c DESC, label ASC) AS rn
         |        FROM counts)
         |SELECT t.cell, CAST(tot.n AS BIGINT) AS n, CAST(t.label AS BIGINT) AS top_label,
         |       t.c AS top_n, t.c * 1.0 / tot.n AS purity
         |FROM top t JOIN tot ON t.cell = tot.cell WHERE t.rn = 1""".stripMargin,

    "c2_semantic_dedup" ->
      s"""WITH ${kmeansCtes()},
         |pr AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |         ${cosSql("ea.embedding", "eb.embedding")} AS cosine
         |       FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |       JOIN embeddings ea ON ea.vec_id = a.vec_id
         |       JOIN embeddings eb ON eb.vec_id = b.vec_id
         |       WHERE a.cell >= 0),
         |dropped AS (SELECT DISTINCT id2 FROM pr WHERE cosine >= 0.4)
         |SELECT vec_id, cell FROM a1
         |WHERE vec_id NOT IN (SELECT id2 FROM dropped)""".stripMargin,

    "c8_semantic_decontam" ->
      s"""WITH ${kmeansCtes()},
         |asg AS (SELECT a1.vec_id, a1.cell, e.embedding
         |        FROM a1 JOIN embeddings e USING (vec_id)),
         |ev AS (SELECT cell, embedding FROM asg
         |       WHERE vec_id % 23 = 0 AND cell >= 0),
         |cont AS (SELECT DISTINCT t.vec_id
         |         FROM asg t JOIN ev e ON t.cell = e.cell
         |         WHERE t.vec_id % 23 <> 0 AND t.cell >= 0
         |           AND ${cosSql("t.embedding", "e.embedding")} >= 0.4)
         |SELECT vec_id, cell FROM a1
         |WHERE vec_id % 23 <> 0
         |  AND vec_id NOT IN (SELECT vec_id FROM cont)""".stripMargin,

    "st1_corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens,
        |       CAST(sum(len(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,

    // the s16 triple encoding over a 4-element COLUMN vector; same
    // pre-scaling arithmetic before the shared trunc quantization
    "st12_column_gram" -> {
      val cols = Seq(
        "CAST(l_quantity AS DOUBLE)",
        "CAST(l_extendedprice AS DOUBLE) / 1000.0",
        "CAST(l_discount AS DOUBLE) * 10.0",
        "CAST(l_tax AS DOUBLE) * 10.0")
      val qv = cols.map(c => s"CAST(trunc(($c)*64.0) AS BIGINT)").mkString(", ")
      s"""WITH q AS (SELECT [$qv] AS qv FROM lineitem),
         |tri AS (SELECT a.i AS i, b.j AS j
         |        FROM generate_series(1,4) a(i), generate_series(1,4) b(j)
         |        WHERE b.j >= a.i),
         |prods AS (SELECT CAST(tri.i AS INT) AS i, CAST(tri.j AS INT) AS j,
         |                 CAST(SUM(qv[tri.i]*qv[tri.j]) AS BIGINT) AS v
         |          FROM q, tri GROUP BY 1, 2),
         |sums AS (SELECT 0 AS i, CAST(g.j AS INT) AS j,
         |                CAST(SUM(qv[g.j]) AS BIGINT) AS v
         |         FROM q, generate_series(1,4) g(j) GROUP BY 1, 2),
         |cnt AS (SELECT 0 AS i, 0 AS j, COUNT(*) AS v FROM q)
         |SELECT i, j, v FROM prods
         |UNION ALL SELECT i, j, v FROM sums
         |UNION ALL SELECT i, j, v FROM cnt""".stripMargin
    },

    "s16_gram_matrix" -> {
      val quant = "CAST(trunc(CAST(x AS DOUBLE)*1048576.0) AS BIGINT)"
      s"""WITH q AS (SELECT [$quant for x in embedding] AS qv FROM embeddings
         |           WHERE embedding IS NOT NULL),
         |tri AS (SELECT a.i AS i, b.j AS j
         |        FROM generate_series(1,64) a(i), generate_series(1,64) b(j)
         |        WHERE b.j >= a.i),
         |prods AS (SELECT CAST(tri.i AS INT) AS i, CAST(tri.j AS INT) AS j,
         |                 CAST(SUM(qv[tri.i]*qv[tri.j]) AS BIGINT) AS v
         |          FROM q, tri GROUP BY 1, 2),
         |sums AS (SELECT 0 AS i, CAST(g.j AS INT) AS j,
         |                CAST(SUM(qv[g.j]) AS BIGINT) AS v
         |         FROM q, generate_series(1,64) g(j) GROUP BY 1, 2),
         |cnt AS (SELECT 0 AS i, 0 AS j, COUNT(*) AS v FROM q)
         |SELECT i, j, v FROM prods
         |UNION ALL SELECT i, j, v FROM sums
         |UNION ALL SELECT i, j, v FROM cnt""".stripMargin
    },

    "s16b_axis_project" -> {
      val terms = PcaAxis.zipWithIndex.map { case (w, k) =>
        s"CAST(trunc(CAST(embedding[${k + 1}] AS DOUBLE)*1048576.0) AS BIGINT)*($w)"
      }
      s"""SELECT vec_id, ${terms.mkString(" + ")} AS proj
         |FROM embeddings""".stripMargin
    },

    "s16c_gram_by_label" -> {
      val quant = "CAST(trunc(CAST(x AS DOUBLE)*1048576.0) AS BIGINT)"
      s"""WITH q AS (SELECT label, [$quant for x in embedding] AS qv FROM embeddings
         |           WHERE embedding IS NOT NULL),
         |tri AS (SELECT a.i AS i, b.j AS j
         |        FROM generate_series(1,64) a(i), generate_series(1,64) b(j)
         |        WHERE b.j >= a.i),
         |prods AS (SELECT label, CAST(tri.i AS INT) AS i, CAST(tri.j AS INT) AS j,
         |                 CAST(SUM(qv[tri.i]*qv[tri.j]) AS BIGINT) AS v
         |          FROM q, tri GROUP BY 1, 2, 3),
         |sums AS (SELECT label, 0 AS i, CAST(g.j AS INT) AS j,
         |                CAST(SUM(qv[g.j]) AS BIGINT) AS v
         |         FROM q, generate_series(1,64) g(j) GROUP BY 1, 2, 3),
         |cnt AS (SELECT label, 0 AS i, 0 AS j, COUNT(*) AS v FROM q GROUP BY 1)
         |SELECT label, i, j, v FROM prods
         |UNION ALL SELECT label, i, j, v FROM sums
         |UNION ALL SELECT label, i, j, v FROM cnt""".stripMargin
    },

    "tx18_top_ngram" ->
      """WITH ts AS (SELECT doc_id, len(text) AS chars,
        |                   string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT doc_id, chars, ts[i] || ' ' || ts[i+1] AS gram
        |      FROM (SELECT doc_id, chars, ts,
        |                   unnest(generate_series(1, len(ts)-1)) AS i FROM ts)),
        |c AS (SELECT doc_id, chars, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn FROM c)
        |SELECT doc_id, gram AS top_gram, CAST(cnt AS BIGINT) AS top_cnt,
        |       least(1.0, CAST(cnt * len(gram) AS DOUBLE) / CAST(chars AS DOUBLE))
        |         AS top_frac
        |FROM r WHERE rn = 1""".stripMargin,

    // union-of-windows coverage replayed per n: duplicated gram-hash
    // groups -> distinct covered positions -> word-length mass
    "tx22_dup_ngram_coverage" -> {
      def per(n: Int): String = {
        val gram = s"array_to_string(w[i:i+${n - 1}],' ')"
        s"""g$n AS (SELECT doc_id, i, ${phSql(gram)} AS gh
           |  FROM base, LATERAL unnest(generate_series(1, n_words-${n - 1})) s(i)
           |  WHERE n_words >= $n),
           |d$n AS (SELECT doc_id, gh FROM g$n GROUP BY 1,2 HAVING count(*) >= 2),
           |cov$n AS (SELECT DISTINCT g.doc_id, g.i + k AS j
           |  FROM g$n g JOIN d$n USING (doc_id, gh),
           |       LATERAL unnest(generate_series(0, ${n - 1})) u(k)),
           |m$n AS (SELECT c.doc_id, count(*) AS cw, sum(len(b.w[c.j])) AS cc
           |  FROM cov$n c JOIN base b USING (doc_id) GROUP BY 1),
           |out$n AS (SELECT b.doc_id, CAST($n AS INT) AS n,
           |    CAST(b.n_words AS INT) AS n_words,
           |    CAST(coalesce(m.cw,0) AS INT) AS covered_words,
           |    CAST(coalesce(m.cc,0) AS BIGINT) AS covered_chars,
           |    CAST(CASE WHEN b.twc > 0 THEN coalesce(m.cc,0)*1000//b.twc
           |         ELSE 0 END AS BIGINT) AS frac_milli
           |  FROM base b LEFT JOIN m$n m USING (doc_id))""".stripMargin
      }
      s"""WITH base AS (SELECT doc_id, string_split(text,' ') AS w,
         |    len(string_split(text,' ')) AS n_words,
         |    list_sum([len(x) FOR x IN string_split(text,' ')]) AS twc
         |  FROM documents WHERE text IS NOT NULL),
         |${per(3)},
         |${per(5)}
         |SELECT * FROM out3 UNION ALL SELECT * FROM out5""".stripMargin
    },

    // injection + 8-word pre-lining replayed; grouping by the same
    // line hash as the engine (min(line) carry is collision-identical)
    "tx24_boilerplate" ->
      s"""WITH docs AS (SELECT doc_id, source, string_split(text,' ') AS w
         |              FROM documents WHERE text IS NOT NULL),
         |lines AS (
         |  SELECT doc_id, source,
         |         source || ' site banner cookie notice nav' AS line FROM docs
         |  UNION ALL
         |  SELECT doc_id, source, array_to_string(w[(i-1)*8+1:(i-1)*8+8], ' ') AS line
         |  FROM docs, LATERAL unnest(generate_series(1, (len(w)+7)//8)) AS t(i)),
         |lh AS (SELECT doc_id, source, line, ${phSql("line")} AS lh FROM lines),
         |nd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |       FROM docs GROUP BY 1),
         |g AS (SELECT source, lh, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         |             min(line) AS line
         |      FROM lh GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2)
         |SELECT g.source, g.line, g.df, nd.n_docs,
         |       CAST(g.df * 1000 // nd.n_docs AS BIGINT) AS df_milli
         |FROM g JOIN nd USING (source)
         |WHERE g.df * 1000 // nd.n_docs >= 100""".stripMargin,

    // Heaps-law growth: checkpoint = id-range decile; first-bucket per
    // type, token mass per bucket, cumulative over the 10 metadata rows
    "tx25_vocab_growth" ->
      """WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mx FROM documents),
        |tok AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |               unnest(string_split(text,' ')) AS t
        |        FROM documents WHERE text IS NOT NULL),
        |wb AS (SELECT id * 10 // (mx + 1) + 1 AS b, t FROM tok, mx),
        |fb AS (SELECT t, min(b) AS fb FROM wb GROUP BY t),
        |nt AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_types
        |       FROM fb GROUP BY 1),
        |tm AS (SELECT b AS bucket, CAST(count(*) AS BIGINT) AS bucket_tokens
        |       FROM wb GROUP BY 1),
        |j AS (SELECT coalesce(nt.bucket, tm.bucket) AS bucket,
        |             coalesce(new_types, 0) AS new_types,
        |             coalesce(bucket_tokens, 0) AS bucket_tokens
        |      FROM nt FULL JOIN tm ON nt.bucket = tm.bucket)
        |SELECT bucket, new_types, bucket_tokens,
        |       CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT) AS vocab_size,
        |       CAST(sum(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT) AS tokens_seen,
        |       CAST((sum(new_types) OVER (ORDER BY bucket)) * 1000 //
        |            greatest(sum(bucket_tokens) OVER (ORDER BY bucket), 1) AS BIGINT)
        |         AS types_per_kilotoken
        |FROM j""".stripMargin,

    // Zipf audit: global token counts, top-20 by (cnt desc, token asc),
    // rank x count products against the rank-1 mass
    "tx26_zipf" ->
      """WITH tok AS (SELECT unnest(string_split(text,' ')) AS token
        |             FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
        |top AS (SELECT * FROM c ORDER BY cnt DESC, token ASC LIMIT 20),
        |m AS (SELECT max(cnt) AS c1 FROM c),
        |r AS (SELECT token, cnt,
        |             CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT)
        |               AS rank
        |      FROM top)
        |SELECT rank, token, cnt, rank * cnt AS rank_cnt,
        |       CAST(rank * cnt * 1000 // c1 AS BIGINT) AS zipf_milli
        |FROM r, m""".stripMargin,

    "tx19_nfc_audit" ->
      """WITH inj AS (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS t
        |             FROM documents),
        |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM inj)
        |SELECT doc_id, nt != t AS changed, length(nt) AS norm_chars,
        |       md5(nt) AS norm_md5
        |FROM n""".stripMargin,

    "tx20_script_profile" ->
      """WITH inj AS (SELECT doc_id,
        |  replace(replace(replace(text, 'o', chr(1086)), 'i', chr(953)),
        |          'u', chr(20013)) AS t FROM documents),
        |c AS (SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z]')) AS n_latin,
        |  len(regexp_extract_all(t, '[0-9]')) AS n_digit,
        |  len(regexp_extract_all(t, '[' || chr(1024) || '-' || chr(1279) || ']')) AS n_cyrillic,
        |  len(regexp_extract_all(t, '[' || chr(880) || '-' || chr(1023) || ']')) AS n_greek,
        |  len(regexp_extract_all(t, '[' || chr(19968) || '-' || chr(40959) || ']')) AS n_cjk,
        |  len(regexp_extract_all(t, '[' || chr(1536) || '-' || chr(1791) || ']')) AS n_arabic
        |  FROM inj),
        |m AS (SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) AS mx FROM c)
        |SELECT doc_id, n_latin, n_digit, n_cyrillic, n_greek, n_cjk, n_arabic,
        |  CASE WHEN mx > 0 AND n_latin = mx THEN 'latin'
        |       WHEN mx > 0 AND n_cyrillic = mx THEN 'cyrillic'
        |       WHEN mx > 0 AND n_greek = mx THEN 'greek'
        |       WHEN mx > 0 AND n_cjk = mx THEN 'cjk'
        |       WHEN mx > 0 AND n_arabic = mx THEN 'arabic'
        |       WHEN mx > 0 AND n_digit = mx THEN 'digit'
        |       ELSE 'none' END AS dominant
        |FROM m""".stripMargin,

    // lang-id replayed over the SAME injected copy as the script
    // profile; mismatch = language's expected script != dominant
    "tx23_lang_script_mismatch" -> {
      def ratio(words: Seq[String]) = {
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(w, t2 -> list_contains($arr, t2)))*1.0 / greatest(len(w), 1)"
      }
      s"""WITH inj AS (SELECT doc_id,
         |  regexp_replace(text, '[bcgijklmprsuvwyz]', chr(1078), 'g') AS t
         |  FROM documents),
         |b AS (SELECT doc_id, t, string_split(t,' ') AS w FROM inj),
         |c AS (SELECT doc_id,
         |  len(regexp_extract_all(t, '[一-鿿]'))*1.0 / greatest(len(t), 1) AS cjk,
         |  ${ratio(TextFunctions.StopEn)} AS s_en, ${ratio(TextFunctions.StopDe)} AS s_de,
         |  ${ratio(TextFunctions.StopFr)} AS s_fr, ${ratio(TextFunctions.StopEs)} AS s_es
         |  FROM b),
         |l AS (SELECT doc_id,
         |  CASE WHEN cjk > 0.3 THEN 'zh'
         |       WHEN s_en = 0.0 AND s_de = 0.0 AND s_fr = 0.0 AND s_es = 0.0 THEN 'und'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS lang_id FROM c),
         |sc0 AS (SELECT doc_id,
         |  len(regexp_extract_all(t, '[A-Za-z]')) AS n_latin,
         |  len(regexp_extract_all(t, '[0-9]')) AS n_digit,
         |  len(regexp_extract_all(t, '[' || chr(1024) || '-' || chr(1279) || ']')) AS n_cyrillic,
         |  len(regexp_extract_all(t, '[' || chr(880) || '-' || chr(1023) || ']')) AS n_greek,
         |  len(regexp_extract_all(t, '[' || chr(19968) || '-' || chr(40959) || ']')) AS n_cjk,
         |  len(regexp_extract_all(t, '[' || chr(1536) || '-' || chr(1791) || ']')) AS n_arabic
         |  FROM inj),
         |m AS (SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_digit) AS mx FROM sc0),
         |sc AS (SELECT doc_id,
         |  CASE WHEN mx > 0 AND n_latin = mx THEN 'latin'
         |       WHEN mx > 0 AND n_cyrillic = mx THEN 'cyrillic'
         |       WHEN mx > 0 AND n_greek = mx THEN 'greek'
         |       WHEN mx > 0 AND n_cjk = mx THEN 'cjk'
         |       WHEN mx > 0 AND n_arabic = mx THEN 'arabic'
         |       WHEN mx > 0 AND n_digit = mx THEN 'digit'
         |       ELSE 'none' END AS dominant FROM m),
         |j AS (SELECT lang_id, dominant FROM l JOIN sc USING (doc_id))
         |SELECT lang_id, dominant, CAST(count(*) AS BIGINT) AS n_docs,
         |  CASE WHEN lang_id IN ('en','de','fr','es') THEN dominant <> 'latin'
         |       WHEN lang_id = 'zh' THEN dominant <> 'cjk'
         |       ELSE FALSE END AS mismatch
         |FROM j GROUP BY 1, 2""".stripMargin
    },

    "tx17_vocab_coverage" ->
      """SELECT source,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       CAST(sum(len(list_filter(string_split(text, ' '), t -> t IN
        |         ('the','a','of','to','and','scan','column','window',
        |          'sort','value','query','merge')))) AS BIGINT) AS n_in_vocab
        |FROM documents GROUP BY source""".stripMargin,

    "tx16_collocations" ->
      """WITH ts AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |bi AS (SELECT ts[i] AS pa, ts[i+1] AS pb
        |       FROM (SELECT ts, unnest(generate_series(1, len(ts)-1)) AS i FROM ts)),
        |bc AS (SELECT pa, pb, count(*) AS cxy FROM bi GROUP BY 1, 2
        |       HAVING count(*) >= 5),
        |uni AS (SELECT t AS w, count(*) AS c
        |        FROM (SELECT unnest(ts) AS t FROM ts) GROUP BY 1),
        |n AS (SELECT sum(greatest(len(ts) - 1, 0)) AS n FROM ts)
        |SELECT pa, pb, cxy, ua.c AS ca, ub.c AS cb,
        |       CAST(cxy * n.n AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) AS score
        |FROM bc JOIN uni ua ON bc.pa = ua.w
        |        JOIN uni ub ON bc.pb = ub.w CROSS JOIN n""".stripMargin,

    "tx8_tfidf" ->
      """WITH tf AS (SELECT doc_id, t AS term, count(*) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents)
        |            GROUP BY doc_id, t),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |        CAST(tf*n AS DOUBLE)/CAST(df AS DOUBLE) AS score,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY CAST(tf*n AS DOUBLE)/CAST(df AS DOUBLE) DESC, term ASC) AS rank
        |      FROM tf JOIN dfq USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, df, score, rank FROM s WHERE rank <= 3""".stripMargin,

    // identical page construction and identical extraction chain —
    // RE2 and java.util.regex agree on this restricted pattern syntax
    // same deterministic corruption, same regex classes (embedded
    // verbatim from Curation), repair simulated with the only digraph
    // present in the data
    "tx13_encoding_quality" ->
      s"""WITH c AS (SELECT doc_id, text,
         |  CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©')
         |       WHEN doc_id % 7 = 1 THEN text || '��'
         |       WHEN doc_id % 7 = 2 THEN chr(1) || text || chr(7)
         |       ELSE text END AS t FROM documents),
         |x AS (SELECT doc_id, t,
         |  CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'é') ELSE t END AS xp
         |  FROM c),
         |r AS (SELECT doc_id,
         |  len(regexp_extract_all(t, '�')) AS n_repl,
         |  len(regexp_extract_all(t, '${Curation.ControlCharClass}')) AS n_ctrl,
         |  len(regexp_extract_all(t, '${Curation.MojibakeClass}')) AS n_moji,
         |  (replace(t, 'Ã©', 'é') = xp) AS repaired_ok
         |  FROM x)
         |SELECT doc_id, n_repl, n_ctrl, n_moji, repaired_ok,
         |       (n_repl = 0 AND n_ctrl = 0 AND n_moji = 0) AS keep
         |FROM r""".stripMargin,

    "tx12_markup_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>t</title><script type="text/javascript">var x = 1 && 2;</script><style>p { color: red; }</style></head><!-- nav --><body><h1>'
        |  || source || '</h1><p>' || replace(text, ' ', '</p> <p>') ||
        |  '</p><div class="ft">&amp;copy; 2026 &lt;corp&gt;&nbsp;&#39;end&#39;</div></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS extracted
        |FROM h""".stripMargin,

    // per-(entity, day) distinct activity, first day per entity,
    // cumulative over day rows
    "v4_entity_novelty" ->
      """WITH p AS (SELECT DISTINCT user_id, event_type,
        |             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |           FROM events),
        |fd AS (SELECT user_id, event_type, min(day) AS fd FROM p GROUP BY 1, 2),
        |a AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active FROM p GROUP BY 1),
        |f AS (SELECT fd AS day, CAST(count(*) AS BIGINT) AS n_new FROM fd GROUP BY 1),
        |j AS (SELECT coalesce(a.day, f.day) AS day,
        |             coalesce(n_active, 0) AS n_active,
        |             coalesce(n_new, 0) AS n_new
        |      FROM a FULL JOIN f ON a.day = f.day)
        |SELECT day, n_active, n_new,
        |       CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |            AS BIGINT) AS cum_entities,
        |       CAST(n_new * 1000 // greatest(n_active, 1) AS BIGINT) AS new_milli
        |FROM j""".stripMargin,

    // md5 equality inside each engine is content equality — the hashes
    // integer cross-multiplied share drift — boolean exact cross-engine
    "v3_time_share_drift" ->
      """WITH e AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
        |                  event_type FROM events),
        |g AS (SELECT bucket, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        |bt AS (SELECT bucket, sum(n) AS bn FROM g GROUP BY bucket),
        |st AS (SELECT event_type, sum(n) AS sn FROM g GROUP BY event_type),
        |tt AS (SELECT sum(n) AS tot FROM g)
        |SELECT g.bucket, g.event_type, CAST(g.n AS BIGINT) AS n,
        |       (g.n * tot * 100 > sn * bn * 120) OR (g.n * tot * 100 < sn * bn * 80) AS drifted
        |FROM g JOIN bt USING (bucket) JOIN st USING (event_type) CROSS JOIN tt""".stripMargin,

    "v2_profile_drift" ->
      """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
        |u AS (
        |  SELECT source, n_chars, 0 AS snap FROM documents CROSS JOIN mx
        |  WHERE doc_id * 2 <= m
        |  UNION ALL
        |  SELECT source, n_chars, 1 AS snap FROM documents CROSS JOIN mx
        |  WHERE doc_id * 2 > m AND (source <> 'src7' OR doc_id % 3 = 0)),
        |g AS (SELECT source,
        |        CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |        CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |        avg(CASE WHEN snap = 0 THEN n_chars END) AS mean_len_old,
        |        avg(CASE WHEN snap = 1 THEN n_chars END) AS mean_len_new
        |      FROM u GROUP BY 1),
        |t AS (SELECT CAST(sum(n_old) AS BIGINT) AS tot_old,
        |             CAST(sum(n_new) AS BIGINT) AS tot_new FROM g)
        |SELECT source, n_old, n_new, mean_len_old, mean_len_new,
        |       (n_new * tot_old * 100 > n_old * tot_new * 120) OR
        |       (n_new * tot_old * 100 < n_old * tot_new * 80) AS drifted
        |FROM g CROSS JOIN t""".stripMargin,

    // themselves never cross engines, only the status strings do
    "v1_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(concat_ws(chr(1), text, lang, source)) AS h
        |           FROM documents WHERE doc_id % 10 <> 7),
        |n AS (SELECT doc_id, md5(concat_ws(chr(1),
        |               CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END,
        |               lang, source)) AS h
        |      FROM documents WHERE doc_id % 10 <> 3)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h""".stripMargin,

    // greedy leftmost merge replayed as a per-word recursive-CTE walk
    // (index jump i+2 on match); validated against a reference BPE —
    // the engine's left-fold formulation is equivalent (spec-pinned)
    "tx15_bpe_merges" ->
      s"""WITH RECURSIVE
         |${bpeCtes(3)}
         |SELECT CAST(1 AS BIGINT) AS round, pa AS "left", pb AS "right", cnt FROM b1
         |UNION ALL SELECT 2, pa, pb, cnt FROM b2
         |UNION ALL SELECT 3, pa, pb, cnt FROM b3""".stripMargin,

    // encode path: every doc's words segmented by the w3 vocab (the
    // walks already applied all three merges per word); left join
    // keeps empty docs at 0
    // fixed word-initial merge chain (j+o, h+a, jo+h) applied in SQL —
    // position-1 merges are load-bearing in ~1.9k corpus words
    "tx15c_bpe_apply_initial" ->
      s"""WITH RECURSIVE
         |${bpeApplyCtes(Seq("j" -> "o", "h" -> "a", "jo" -> "h"))},
         |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
         |cnts AS (SELECT doc_id, sum(len(syms)) AS n
         |  FROM tok JOIN w3 USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_bpe
         |FROM documents d LEFT JOIN cnts c USING (doc_id)""".stripMargin,

    "tx15b_bpe_tokens" ->
      s"""WITH RECURSIVE
         |${bpeCtes(3)},
         |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
         |cnts AS (SELECT doc_id, sum(len(syms)) AS n
         |  FROM tok JOIN w3 USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_bpe
         |FROM documents d LEFT JOIN cnts c USING (doc_id)""".stripMargin,

    // tx15b's per-doc tokenization rolled up per language with the
    // word/char masses and an integer milli-fertility
    "tx21_tokenizer_fertility" ->
      s"""WITH RECURSIVE
         |${bpeCtes(3)},
         |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
         |cnts AS (SELECT doc_id, sum(len(syms)) AS n
         |  FROM tok JOIN w3 USING (word) GROUP BY doc_id),
         |base AS (SELECT d.lang, coalesce(c.n, 0) AS bpe,
         |           len(string_split(d.text,' ')) AS wrds, len(d.text) AS chars
         |         FROM documents d LEFT JOIN cnts c USING (doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |       CAST(sum(wrds) AS BIGINT) AS words,
         |       CAST(sum(chars) AS BIGINT) AS chars,
         |       CAST(sum(bpe) * 1000 // sum(wrds) AS BIGINT) AS fertility_milli
         |FROM base GROUP BY 1""".stripMargin,

    // the oracle unrolls the SAME three fixed-point GD iterations: per
    // doc the float tree (normalize → dot → sigmoid → contrib) is
    // evaluated in the engine's exact operation order, quantized to
    // BIGINT at 1e6, summed exactly, and folded into the next weights
    // with the identical ((g/scale)/n)*lr association
    "p16_classifier_train" -> {
      val dims = 8; val iters = 3
      val tHash = s"CASE WHEN t = '' THEN 0 ELSE ${phSql("t")} END"
      val uCols = (0 until dims).map(j =>
        s"CAST(len(list_filter(w, t -> ($tHash) % $dims = $j)) AS DOUBLE)" +
          s"/CAST(len(w) AS DOUBLE) AS u$j").mkString(", ")
      val fCte =
        s"f AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, $uCols" +
          " FROM (SELECT lang, string_split(text,' ') AS w FROM documents))"
      def wRef(it: Int, j: Int): String = if (it == 0) "0.0" else s"w$j"
      val iterCtes = (1 to iters).map { it =>
        val z = (0 until dims).map(j => s"${wRef(it - 1, j)}*u$j").mkString(" + ")
        val gs = (0 until dims).map(j =>
          s"sum(CAST(round((1.0/(1.0 + exp(-($z))) - y) * u$j * 1000000.0) " +
            s"AS BIGINT)) AS g$j").mkString(", ")
        val src = if (it == 1) "f" else s"f CROSS JOIN w${it - 1}"
        val ws = (0 until dims).map(j =>
          s"${wRef(it - 1, j)} - 0.5*(CAST(g$j AS DOUBLE)/1000000.0" +
            s"/CAST(n AS DOUBLE)) AS w$j").mkString(", ")
        val wSrc = if (it == 1) s"g$it" else s"g$it CROSS JOIN w${it - 1}"
        s"g$it AS (SELECT $gs, count(*) AS n FROM $src),\n" +
          s"w$it AS (SELECT $ws FROM $wSrc)"
      }.mkString(",\n")
      val unpivot = (0 until dims).map(j =>
        s"SELECT CAST($j AS BIGINT) AS dim, w$j AS weight FROM w$iters")
        .mkString("\nUNION ALL ")
      s"WITH $fCte,\n$iterCtes\n$unpivot"
    },

    "tx14_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |p AS (SELECT doc_id, unnest(generate_series(1, len(w)-1)) AS i, w
         |      FROM t WHERE len(w) >= 2),
         |m AS (SELECT doc_id, i FROM p
         |      WHERE w[i]='big' AND w[i+1]='order')
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS hits,
         |       CAST(min(i) AS BIGINT) AS first_pos
         |FROM m GROUP BY doc_id""".stripMargin,

    // phraseHits replayed per doc over the boundary-bearing feed: hits
    // for EVERY doc (zero when absent), exact-length docs count their
    // single position — the `>=` gate is the decided branch
    "tx27_phrase_hits" ->
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN doc_id % 13 = 0 THEN 'big order' ELSE text END AS t
        |           FROM documents),
        |tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM d)
        |SELECT doc_id,
        |       CAST(CASE WHEN len(w) >= 2 THEN
        |         len(list_filter(generate_series(1, len(w)-1),
        |                         i -> w[i]='big' AND w[i+1]='order'))
        |       ELSE 0 END AS INT) AS hits
        |FROM tk""".stripMargin,

    // the engine folds (k1+1), (1-b) driver-side; the SAME doubles are
    // rendered here so both engines replay one float expression tree
    "tx11_bm25_search" -> {
      val (c1, omb, k1s, bs) = Curation.bm25Constants()
      val terms = Seq("spark", "window", "merge")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(string_split(text,' '), x -> x = '$t')) AS tf$i" }
      val dfCols = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      val scoreTerms = terms.indices.map(i =>
        s"""(CASE WHEN tf$i > 0 THEN ((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) * (CAST(tf$i AS DOUBLE) * $c1) / (CAST(tf$i AS DOUBLE) + $k1s * ($omb + $bs * (CAST(dl AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))))) ELSE 0.0 END)""")
      s"""WITH m AS (SELECT doc_id, ${tfCols.mkString(", ")},
         |             len(string_split(text,' ')) AS dl FROM documents),
         |st AS (SELECT count(*) AS n, sum(dl) AS tot, ${dfCols.mkString(", ")} FROM m),
         |sc AS (SELECT doc_id, ${scoreTerms.mkString(" + ")} AS score
         |       FROM m CROSS JOIN st),
         |top AS (SELECT doc_id, score FROM sc WHERE score > 0.0
         |        ORDER BY score DESC, doc_id ASC LIMIT 10)
         |SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
         |FROM top""".stripMargin
    },

    // both source rankings replayed exactly (the s1 cosine shape at
    // k=20, the tx11 BM25 shape at k=20), then pure-integer fusion
    "s20_rrf_fusion" -> {
      val (c1, omb, k1s, bs) = Curation.bm25Constants()
      val terms = Seq("spark", "window", "merge")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(string_split(text,' '), x -> x = '$t')) AS tf$i" }
      val dfCols = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      val scoreTerms = terms.indices.map(i =>
        s"""(CASE WHEN tf$i > 0 THEN ((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) * (CAST(tf$i AS DOUBLE) * $c1) / (CAST(tf$i AS DOUBLE) + $k1s * ($omb + $bs * (CAST(dl AS DOUBLE) / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))))) ELSE 0.0 END)""")
      s"""WITH scored AS (
         |  SELECT c.vec_id AS cid, ${cosSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings c JOIN embeddings q ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id = 7),
         |vr0 AS (SELECT cid, row_number() OVER (ORDER BY cosine DESC, cid ASC) AS rank
         |        FROM scored),
         |vr AS (SELECT cid AS id, rank FROM vr0 WHERE rank <= 20),
         |m AS (SELECT doc_id, ${tfCols.mkString(", ")},
         |        len(string_split(text,' ')) AS dl FROM documents),
         |st AS (SELECT count(*) AS n, sum(dl) AS tot, ${dfCols.mkString(", ")} FROM m),
         |sc AS (SELECT doc_id, ${scoreTerms.mkString(" + ")} AS score
         |       FROM m CROSS JOIN st),
         |bt AS (SELECT doc_id, score FROM sc WHERE score > 0.0
         |       ORDER BY score DESC, doc_id ASC LIMIT 20),
         |br AS (SELECT doc_id AS id,
         |         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
         |       FROM bt),
         |u AS (SELECT id, 1048576 // (60 + rank) AS w FROM vr
         |      UNION ALL SELECT id, 1048576 // (60 + rank) AS w FROM br),
         |f AS (SELECT id, CAST(sum(w) AS BIGINT) AS rrf_q,
         |        CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY id),
         |top AS (SELECT * FROM f ORDER BY rrf_q DESC, id ASC LIMIT 10)
         |SELECT id, rrf_q, n_lists,
         |       CAST(row_number() OVER (ORDER BY rrf_q DESC, id ASC) AS INT) AS rank
         |FROM top""".stripMargin
    },

    "d10_cross_dedup" ->
      s"""WITH $shingleCtes,
         |shh AS (SELECT DISTINCT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM shh GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |cand AS (SELECT DISTINCT nw.doc_id AS nid, rf.doc_id AS rid
         |         FROM (SELECT * FROM bands WHERE doc_id % 3 <> 0) nw
         |         JOIN (SELECT * FROM bands WHERE doc_id % 3 = 0) rf
         |           ON nw.band = rf.band AND nw.bh = rf.bh),
         |est AS (SELECT nid, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON rid = a.doc_id JOIN sig b ON nid = b.doc_id),
         |bad AS (SELECT DISTINCT nid FROM est WHERE est_jaccard >= 0.5)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id % 3 <> 0 AND doc_id NOT IN (SELECT nid FROM bad)""".stripMargin,

    "p6_dsir_weights" -> {
      val gram2 = "w[i]||' '||w[i+1]"
      s"""WITH cw AS (SELECT doc_id, string_split(text,' ') AS w FROM documents
         |            WHERE doc_id % 41 <> 0),
         |cg AS (SELECT doc_id, unnest(generate_series(1, len(w)-1)) AS i, w
         |       FROM cw WHERE len(w) >= 2),
         |chh AS (SELECT doc_id, ${phSql(gram2)} AS gh FROM cg),
         |dom AS (SELECT unnest(generate_series(0, 1023)) AS b),
         |lr AS (SELECT b, ${dsirStubWeightsSql("b")} AS lq FROM dom),
         |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |              CAST(sum(lq) AS BIGINT) AS logw_q
         |       FROM chh JOIN lr ON chh.gh % 1024 = lr.b GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
         |       CAST(coalesce(s.logw_q, 0) AS BIGINT) AS logw_q
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 41 <> 0) d
         |LEFT JOIN sc s USING (doc_id)""".stripMargin
    },

    "p6b_dsir_counts" -> {
      val gram2 = "w[i]||' '||w[i+1]"
      s"""WITH cw AS (SELECT doc_id, string_split(text,' ') AS w FROM documents
         |            WHERE doc_id % 41 <> 0),
         |cg AS (SELECT doc_id, unnest(generate_series(1, len(w)-1)) AS i, w
         |       FROM cw WHERE len(w) >= 2),
         |chh AS (SELECT doc_id, ${phSql(gram2)} AS gh FROM cg),
         |tw AS (SELECT doc_id, string_split(text,' ') AS w FROM documents
         |       WHERE doc_id % 41 = 0),
         |tg AS (SELECT doc_id, unnest(generate_series(1, len(w)-1)) AS i, w
         |       FROM tw WHERE len(w) >= 2),
         |thh AS (SELECT doc_id, ${phSql(gram2)} AS gh FROM tg)
         |SELECT gh % 1024 AS bucket, count(*) AS n, 'target' AS side
         |FROM thh GROUP BY 1
         |UNION ALL
         |SELECT gh % 1024 AS bucket, count(*) AS n, 'corpus' AS side
         |FROM chh GROUP BY 1""".stripMargin
    },

    "d11_dedup_keep_best" ->
      s"""WITH $simhashFactoredCtes,
         |$simhashEdgeCtes,
         |${componentCtes()},
         |m AS (SELECT comp.v, comp.c, d.n_chars
         |      FROM comp JOIN documents d ON d.doc_id = comp.v),
         |w AS (SELECT c, v AS keep FROM (
         |        SELECT c, v, row_number() OVER (PARTITION BY c
         |          ORDER BY n_chars DESC, v ASC) AS rn FROM m) WHERE rn = 1),
         |dropped AS (SELECT v FROM m JOIN w USING (c) WHERE v <> keep)
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT v FROM dropped)""".stripMargin,

    "p7_split" ->
      s"""SELECT doc_id, lang,
         |  CASE WHEN ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
         |       WHEN ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    // same integer chunk-count arithmetic; stride = 150
    "p14_chunking" ->
      """SELECT doc_id, i - 1 AS chunk_id,
        |       substr(text, (i - 1) * 150 + 1, 200) AS chunk
        |FROM documents,
        |     LATERAL unnest(generate_series(1,
        |       greatest(1, (len(text) - 50 + 149) // 150))) AS t(i)
        |WHERE text IS NOT NULL""".stripMargin,

    // the tx7 → d1 → d8b → p7 chains composed: each stage's CTE
    // consumes the previous stage's survivor set
    "p13_corpus_pipeline" -> {
      val stopEn = TextFunctions.StopEn.map(w => s"'$w'").mkString("[", ", ", "]")
      val gram5 = "w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]"
      s"""WITH b AS (SELECT doc_id, string_split(text,' ') AS w FROM documents
         |           WHERE doc_id % 37 <> 0),
         |c AS (SELECT doc_id, len(w) AS n_words,
         |  list_sum([len(t) for t in w])*1.0 / greatest(len(w), 1) AS mean_word_len,
         |  len(list_distinct(w))*1.0 / greatest(len(w), 1) AS frac_unique_words,
         |  len(list_filter(w, t -> list_contains($stopEn, t))) AS n_stop_hits
         |  FROM b),
         |g AS (SELECT doc_id FROM c
         |      WHERE n_words >= 50 AND n_words <= 100000
         |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |        AND n_stop_hits >= 2 AND frac_unique_words >= 0.2),
         |gd AS (SELECT d.doc_id, d.text FROM documents d JOIN g USING (doc_id)),
         |dd AS (SELECT min(doc_id) AS doc_id FROM gd GROUP BY text),
         |ddd AS (SELECT gd.doc_id, gd.text FROM gd JOIN dd USING (doc_id)),
         |bt AS (SELECT string_split(text,' ') AS w FROM documents WHERE doc_id % 37 = 0),
         |bg AS (SELECT unnest(generate_series(1, len(w)-4)) AS i, w FROM bt),
         |bs AS (SELECT DISTINCT $gram5 AS s FROM bg),
         |bh AS (SELECT DISTINCT ${phSql("s")} AS sh FROM bs),
         |ct AS (SELECT doc_id, string_split(text,' ') AS w FROM ddd),
         |cg AS (SELECT doc_id, unnest(generate_series(1, len(w)-4)) AS i, w FROM ct),
         |cs AS (SELECT DISTINCT doc_id, $gram5 AS s FROM cg),
         |ch AS (SELECT DISTINCT doc_id, ${phSql("s")} AS sh FROM cs),
         |bad AS (SELECT DISTINCT doc_id FROM ch JOIN bh USING (sh))
         |SELECT doc_id,
         |  CASE WHEN ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
         |       WHEN ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM ddd WHERE doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin
    },

    // the d10 cross-corpus minhash chain with split-label sides: train
    // docs banding with a test doc at est >= 0.5 are dropped
    "p12_leakage_split" ->
      s"""WITH $shingleCtes,
         |shh AS (SELECT DISTINCT doc_id, ${phSql("s")} AS h FROM sh),
         |sig AS (SELECT doc_id, $minhashSigCols FROM shh GROUP BY doc_id),
         |bands AS (${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, ${bandHashSql(b)} AS bh FROM sig")
             .mkString(" UNION ALL ")}),
         |spl AS (SELECT doc_id,
         |          CASE WHEN ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
         |               WHEN ${phSql("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
         |               ELSE 'test' END AS split FROM documents),
         |cand AS (SELECT DISTINCT nw.doc_id AS nid, rf.doc_id AS rid
         |         FROM (SELECT b.* FROM bands b JOIN spl USING (doc_id)
         |               WHERE spl.split = 'train') nw
         |         JOIN (SELECT b.* FROM bands b JOIN spl USING (doc_id)
         |               WHERE spl.split = 'test') rf
         |           ON nw.band = rf.band AND nw.bh = rf.bh),
         |est AS (SELECT nid, $sigAgreeSql / 16.0 AS est_jaccard
         |        FROM cand JOIN sig a ON rid = a.doc_id JOIN sig b ON nid = b.doc_id),
         |bad AS (SELECT DISTINCT nid FROM est WHERE est_jaccard >= 0.5)
         |SELECT d.doc_id, spl.split FROM documents d JOIN spl USING (doc_id)
         |WHERE NOT (spl.split = 'train' AND d.doc_id IN (SELECT nid FROM bad))""".stripMargin,

    // exact tier: the sketch never evicts at gate scale, so exact
    // wordcount + deterministic (n desc, token asc) rank replays it
    "st5_heavy_hitters" ->
      """WITH tk AS (SELECT lang, t AS token FROM
        |  (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |ct AS (SELECT lang, token, count(*) AS n FROM tk GROUP BY lang, token),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY n DESC, token ASC) AS rank FROM ct)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, token, CAST(n AS BIGINT) AS n
        |FROM r WHERE rank <= 10""".stripMargin,

    // quantile_disc(0.5) is the lower median — the same smallest-q-
    // reaching-ceil(n/2) rule the histogram recovers
    "st11_mad_outliers" ->
      """WITH v AS (SELECT event_type,
        |    CAST(trunc(CAST(value AS DOUBLE)*1024) AS BIGINT) AS q
        |  FROM events WHERE value IS NOT NULL),
        |med AS (SELECT event_type, CAST(quantile_disc(q, 0.5) AS BIGINT) AS med_q,
        |          CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |d AS (SELECT v.event_type, abs(q - med_q) AS dev
        |      FROM v JOIN med USING (event_type)),
        |mad AS (SELECT event_type, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad_q
        |        FROM d GROUP BY 1),
        |o AS (SELECT d.event_type,
        |        CAST(sum(CASE WHEN dev > 3*mad_q THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_outliers
        |      FROM d JOIN mad USING (event_type) GROUP BY 1)
        |SELECT med.event_type, n, med_q, mad_q, n_outliers
        |FROM med JOIN mad USING (event_type) JOIN o USING (event_type)""".stripMargin,

    "st2_numeric_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map(c =>
        s"""SELECT '$c' AS "column", count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
    },

    "p9_classifier_filter" -> {
      // empty-token guard: Spark polyHash('') folds zero codepoints to
      // 0, but DuckDB's list_reduce seeds with the first element and
      // unicode('') = -1 — so '' must hash to 0 explicitly here
      val tHash = s"CASE WHEN t = '' THEN 0 ELSE ${phSql("t")} END"
      val wSql = s"CAST((1103515245*($tHash % 1024) + 12345) % 2000003 - 1000001 AS DOUBLE)/1000001.0"
      s"""WITH b AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |s AS (SELECT doc_id,
         |        list_reduce(list_prepend(0.0, [$wSql for t in w]),
         |                    (a, x) -> a + x) AS logit
         |      FROM b)
         |SELECT doc_id, logit, logit > 0.0 AS keep FROM s""".stripMargin
    },

    // p9's logit fold, then the clamped equal-width cell and integer
    // per-cell aggregates — all gated values are counts or exact sums
    // of trunc(logit*2^20)
    "p21_classifier_calibration" -> {
      val tHash = s"CASE WHEN t = '' THEN 0 ELSE ${phSql("t")} END"
      val wSql = s"CAST((1103515245*($tHash % 1024) + 12345) % 2000003 - 1000001 AS DOUBLE)/1000001.0"
      s"""WITH b AS (SELECT doc_id, lang, string_split(text,' ') AS w FROM documents),
         |s AS (SELECT doc_id, lang = 'en' AS label,
         |        list_reduce(list_prepend(0.0, [$wSql for t in w]),
         |                    (a, x) -> a + x) AS logit
         |      FROM b)
         |SELECT CAST(least(greatest(floor((logit - (-30.0))/40.0*20.0), 0.0), 19.0) AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         |       CAST(sum(CAST(trunc(logit*1048576.0) AS BIGINT)) AS BIGINT) AS score_qsum
         |FROM s GROUP BY 1""".stripMargin
    },

    "p8_quality_select" ->
      s"""WITH $qualityCtes,
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang
         |        ORDER BY quality DESC, doc_id ASC) AS rn,
         |        count(*) OVER (PARTITION BY lang) AS n FROM q)
         |SELECT doc_id, lang, quality FROM r WHERE rn * 100 <= n * 20""".stripMargin,

    "p10_source_cap" ->
      s"""WITH b AS (SELECT doc_id, source,
         |            ${phSql("CAST(doc_id AS VARCHAR)")} % 1000000 AS qb FROM documents),
         |h AS (SELECT source, qb, count(*) AS c FROM b GROUP BY 1, 2),
         |cum AS (SELECT source, qb,
         |          sum(c) OVER (PARTITION BY source ORDER BY qb ASC) AS cm FROM h),
         |thr AS (SELECT source,
         |          coalesce(min(CASE WHEN cm >= 10 THEN qb END), max(qb)) AS t
         |        FROM cum GROUP BY source)
         |SELECT b.doc_id, b.source FROM b JOIN thr USING (source) WHERE b.qb <= thr.t""".stripMargin,

    // the bucketed scale path: threshold = bucket of the k-th best
    // score per stratum (k = floor(n*20/100)), ties at the threshold
    // bucket inclusive — mirrors Curation.selectAboveQuantile exactly
    "p8b_quality_select_quantile" ->
      s"""WITH $qualityCtes,
         |bk AS (SELECT doc_id, lang, quality,
         |         CAST(floor(quality*1000000) AS BIGINT) AS qb FROM q),
         |r AS (SELECT lang, qb, row_number() OVER (PARTITION BY lang ORDER BY qb DESC) AS rn,
         |        count(*) OVER (PARTITION BY lang) AS n FROM bk),
         |thr AS (SELECT lang, qb AS t FROM r WHERE rn = CAST(floor(n*20/100) AS BIGINT))
         |SELECT bk.doc_id, bk.lang, bk.quality
         |FROM bk JOIN thr USING (lang) WHERE bk.qb >= thr.t""".stripMargin,

    "p24_k_anonymity" ->
      """WITH g AS (SELECT event_type,
        |             date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |             CAST(trunc(CAST(value AS DOUBLE)) AS BIGINT) // 100 AS vb,
        |             count(*) AS sz
        |           FROM events GROUP BY 1, 2, 3)
        |SELECT CAST(sz AS BIGINT) AS group_size,
        |       CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sz * count(*) AS BIGINT) AS n_rows,
        |       sz < 5 AS risky
        |FROM g GROUP BY sz""".stripMargin,

    "p25_mixture_plan" ->
      """WITH t AS (SELECT lang,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS available_tokens,
        |             CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY lang),
        |w AS (SELECT lang, available_tokens, n_docs,
        |        CAST(CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 200
        |                       WHEN 'de' THEN 150 WHEN 'fr' THEN 100
        |                       ELSE 0 END AS BIGINT) AS weight_pm
        |      FROM t),
        |p AS (SELECT *, (2000000 * weight_pm) // 1000 AS target_tokens FROM w),
        |q AS (SELECT *, (target_tokens * 1000) // greatest(available_tokens, 1) AS unc FROM p),
        |q2 AS (SELECT *, unc > 2500 AS cap_bound,
        |         least(2500, unc) AS milli_epochs FROM q),
        |r AS (SELECT *, (available_tokens * milli_epochs) // 1000 AS planned_tokens FROM q2)
        |SELECT lang, available_tokens, n_docs, weight_pm, target_tokens,
        |       milli_epochs, cap_bound, planned_tokens,
        |       CASE WHEN cap_bound
        |            THEN greatest(0, target_tokens - planned_tokens)
        |            ELSE 0 END AS deficit_tokens
        |FROM r""".stripMargin,

    // Poisson(1) weights replayed from the same integer CDF cutoffs
    // over the same portable hash; integer division for the mean
    "p23_bootstrap_ci" -> {
      val u = phSql("CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")
      val cases = graft.pipeline.Curation.PoissonUnitCdf20.zipWithIndex
        .map { case (c, i) => s"WHEN u < $c THEN $i" }.mkString(" ")
      s"""WITH $qualityCtes,
         |m AS (SELECT doc_id, CAST(trunc(quality*1048576.0) AS BIGINT) AS qm FROM q),
         |x AS (SELECT doc_id, qm, unnest(generate_series(0, 31)) AS rep FROM m),
         |h AS (SELECT rep, qm, $u % 1048576 AS u FROM x),
         |w AS (SELECT rep, qm, CASE $cases ELSE 7 END AS w FROM h)
         |SELECT CAST(rep AS INT) AS rep, CAST(sum(w) AS BIGINT) AS n_eff,
         |       CAST(sum(w*qm) AS BIGINT) AS w_sum,
         |       CAST(CASE WHEN sum(w) > 0 THEN sum(w*qm)//sum(w)
         |            ELSE 0 END AS BIGINT) AS mean_q
         |FROM w GROUP BY 1""".stripMargin
    },

    // reference semantics as plain global rank() windows; the engine
    // side recovers the same ranks from value histograms without a
    // global sort. keep rule: borda*100 <= n*(3 signals * 20 pct)
    "p20_rank_ensemble" ->
      s"""WITH $qualityCtes,
         |sig AS (SELECT c.doc_id,
         |  CAST(trunc(q.quality*1048576.0) AS BIGINT) AS sq,
         |  CAST(trunc(c.punct_ratio*1048576.0) AS BIGINT) AS sp,
         |  CAST(c.n_tok AS BIGINT) AS st
         |  FROM c JOIN q ON c.doc_id = q.doc_id),
         |r AS (SELECT doc_id,
         |  CAST(rank() OVER (ORDER BY sq DESC) AS BIGINT) AS r_q,
         |  CAST(rank() OVER (ORDER BY sp ASC) AS BIGINT) AS r_p,
         |  CAST(rank() OVER (ORDER BY st DESC) AS BIGINT) AS r_ntok,
         |  (SELECT CAST(count(*) AS BIGINT) FROM sig) AS n FROM sig)
         |SELECT doc_id, r_q, r_p, r_ntok, r_q + r_p + r_ntok AS borda,
         |       (r_q + r_p + r_ntok) * 100 <= n * 60 AS kept
         |FROM r""".stripMargin,

    "s5_ann_ivfpq" ->
      s"""WITH ${pqCtes()},
         |cents AS (SELECT vec_id AS c, embedding AS ce FROM embeddings
         |          WHERE vec_id >= 100 AND vec_id < 108),
         |${ivfAssignSql("assigned", "rn = 1")},
         |recon AS (SELECT codes.vec_id, flatten(list(sl ORDER BY codes.m)) AS rv
         |          FROM codes JOIN cb ON codes.m = cb.m AND codes.code = cb.c
         |          GROUP BY codes.vec_id HAVING count(*) = 4),
         |q AS (SELECT * FROM assigned WHERE vec_id < 8),
         |scored AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |             ${cosSql("q.embedding", "rc.rv")} AS score
         |           FROM assigned c JOIN q ON c.cell = q.cell AND q.vec_id <> c.vec_id
         |           JOIN recon rc ON rc.vec_id = c.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
         |         ORDER BY score DESC, cid ASC) AS rank FROM scored)
         |SELECT qid, cid, score, rank FROM rk WHERE rank <= 3""".stripMargin,

    "p2_token_pack" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${phSql("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         |  len(string_split(text,' ')) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, shard, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens, 0) AS BIGINT) AS start_tok
         |  FROM b)
         |SELECT doc_id, shard, n_tokens, start_tok, start_tok // 512 AS chunk FROM c""".stripMargin,

    "p19_length_batches" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${phSql("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         |  len(string_split(text,' ')) AS n_tokens FROM documents),
         |k AS (SELECT *, CAST(pow(2, ceil(log2(CAST(greatest(n_tokens, 16) AS DOUBLE)))) AS BIGINT) AS bucket FROM b),
         |r AS (SELECT *, row_number() OVER (PARTITION BY shard, bucket ORDER BY n_tokens, doc_id) AS rn FROM k)
         |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens, bucket,
         |       CAST(floor((rn - 1) / greatest(1, 4096 // bucket)) AS BIGINT) AS batch_id
         |FROM r""".stripMargin,

    "p19b_padding_waste" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${phSql("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
         |  len(string_split(text,' ')) AS n_tokens FROM documents),
         |k AS (SELECT *, CAST(pow(2, ceil(log2(CAST(greatest(n_tokens, 16) AS DOUBLE)))) AS BIGINT) AS bucket FROM b),
         |r AS (SELECT *, row_number() OVER (PARTITION BY shard, bucket ORDER BY n_tokens, doc_id) AS rn FROM k),
         |a AS (SELECT shard, bucket, n_tokens,
         |             CAST(floor((rn - 1) / greatest(1, 4096 // bucket)) AS BIGINT) AS batch_id FROM r)
         |SELECT bucket, CAST(count(DISTINCT (shard, batch_id)) AS BIGINT) AS n_batches,
         |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       CAST(count(*) * bucket - sum(n_tokens) AS BIGINT) AS padded_tokens
         |FROM a GROUP BY bucket""".stripMargin
  )

  /** Serving from a persisted index must be bit-equal to the
    * in-session build — the s10 oracles are the s3/s5 SQL verbatim.
    */
  val oracles: Map[String, String] = oracles0 ++ Map(
    // the distributed-contraction twin computes the same relation —
    // one canonical min-label per component — through the branch the
    // sf0.01 local tail otherwise masks
    "d6c_components_distributed" -> oracles0("d6_dedup_groups"),
    "s10_saved_index" -> oracles0("s3_ann_ivf"),
    "s13_incremental_add" -> oracles0("s3_ann_ivf"),
    // filtered serving from the saved index == in-session filtered IVF
    "s15_saved_filtered" -> oracles0("s14_filtered_ann"),
    "s10b_saved_ivfpq" -> oracles0("s5_ann_ivfpq"),
    // the sketch profile's exact tier must equal count(DISTINCT)
    "st2b_profile_sketch" -> oracles0("st2_numeric_profile"),
    // the bounded-heap top-k must equal the full window-sort ranking
    "st8_topk_docs" ->
      """SELECT source, CAST(rn AS INT) AS rank, n_chars, doc_id FROM (
        |  SELECT source, n_chars, doc_id,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,
    "st7_incremental_profile" -> oracles0("st2_numeric_profile"),
    // dedup from a saved reference index == the in-session d10 run
    "d15_saved_dedup_index" -> oracles0("d10_cross_dedup"),
    // save + append shards == the one-shot index over their union
    "d16_index_append" -> oracles0("d10_cross_dedup"))
}
