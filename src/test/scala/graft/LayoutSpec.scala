package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Layout
import graft.pipeline.Layout.ZCol

/** Z-order layout: key arithmetic (also oracle-gated as
  * `z1_zorder_key`) and the property the layout exists for — per-file
  * min/max statistics prune a predicate on EVERY interleaved column,
  * where a linear sort only prunes its leading column.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quantize: shift-only, monotone, lands in [0, 2^bits)") {
    import spark.implicits._
    val df = Seq(0L, 1L, 499L, 500L, 999L, 1000L).toDF("v")
    val q = df.select(Layout.quantize(ZCol(col("v"), 0L, 1000L), 8).as("q"))
      .as[Long].collect()
    assert(q.head === 0L && q.forall(x => x >= 0 && x < 256))
    assert(q.sameElements(q.sorted)) // monotone over the sorted inputs
    // span 1000 → shift 10: q = (v << 8) >> 10 = v / 4
    assert(q === Array(0L, 0L, 124L, 125L, 249L, 250L))
    // degenerate single-value range maps to 0, no shift blowup
    val z = df.select(Layout.quantize(ZCol(lit(7L), 7L, 7L), 8)).as[Long].collect()
    assert(z.forall(_ === 0L))
  }

  test("zValue interleaves bits, first column most significant") {
    import spark.implicits._
    // 2-bit keys over [0,3]: span 3 → shift 2 → q = v (identity)
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("a", "b")
    val z = df.select(Layout.zValue(
      Seq(ZCol(col("a"), 0L, 3L), ZCol(col("b"), 0L, 3L)), 2).as("z"))
      .as[Long].collect()
    // a=11,b=00 → 1010 = 10; a=00,b=11 → 0101 = 5; a=10,b=01 → 1001 = 9
    assert(z === Array(0L, 10L, 5L, 15L, 9L))
  }

  test("zorderBy: per-file min/max bound BOTH columns; linear sort only one") {
    import spark.implicits._
    // two independent uniform columns — the worst case for linear sort
    // (odd multipliers mod 2^15: exact bijections, so both quantize to
    // the full [0, 256) range)
    val n = 32768
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % n), (i * 40503L % n))
    }.toDF("id", "a", "b")

    val files = 32
    val zdir = Files.createTempDirectory("graft_zorder").toString
    val ldir = Files.createTempDirectory("graft_linear").toString
    Layout.zorderBy(df, Seq("a", "b"), numPartitions = files, bits = 8)
      .write.mode("overwrite").parquet(zdir)
    df.repartitionByRange(files, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(ldir)

    // the per-file stats a row-group/file pruner consumes
    def fileRanges(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min("b").cast("long"), max("b").cast("long")).collect()(0)
          (r.getLong(0), r.getLong(1))
        }

    // predicate on the SECOND column: b in a 1/16-of-domain window
    val (lo, hi) = (n / 2L, n / 2L + n / 16L)
    def overlapping(ranges: Seq[(Long, Long)]): Int =
      ranges.count { case (mn, mx) => mx >= lo && mn <= hi }

    val zHit = overlapping(fileRanges(zdir))
    val lHit = overlapping(fileRanges(ldir))
    // linear layout: every file spans ~the full b-domain → no pruning;
    // z-order: only the z-ranges intersecting the b-window qualify
    assert(lHit >= files - 1, s"linear layout unexpectedly pruned: $lHit/$files")
    assert(zHit * 2 <= files, s"z-order pruned too little: $zHit/$files")
    // the layout rewrite must not change the data itself
    assert(spark.read.parquet(zdir).count() === n.toLong)
    assert(spark.read.parquet(zdir).agg(sum("a"), sum("b")).collect()(0) ===
      df.agg(sum("a"), sum("b")).collect()(0))
  }

  test("partition upsert: only touched partitions rewrite; others stay byte-identical") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-upsert-spec").toString
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(root)

    def snapshot(part: String): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$root/part=$part")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    }
    val aBefore = snapshot("a")
    val bBefore = snapshot("b")
    Thread.sleep(1100) // mtime granularity can be 1s on some filesystems

    // update id 3, insert id 9 — both land in partition b only
    val updates = Seq((3L, "b", 333L), (9L, "b", 90L)).toDF("id", "part", "v")
    graft.pipeline.Layout.upsertPartitioned(spark, root, updates, "id", "part")

    assert(snapshot("a") === aBefore, "untouched partition a must keep its exact files")
    assert(snapshot("b") !== bBefore, "touched partition b must have been rewritten")
    val rows = spark.read.parquet(root).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 10L, 2L -> 20L, 3L -> 333L, 4L -> 40L, 9L -> 90L))
  }

  test("fileStats parallelizes one slice per file (capped at 64)") {
    // The footer scan's 100 TB contract: reading N file footers is an
    // N-way parallel job, not a single-slice driver-adjacent loop and
    // not a fixed 64-partition fan-out over 3 files. Pins the
    // max(1, min(files, 64)) slice count — kills the h086 (always 1
    // slice) and h087 (always 64 slices) parallelism mutants, which
    // are result-identical and therefore gate-invisible.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fstats_par").toString
    (0L until 90L).map(i => (i, i % 3)).toDF("k", "b")
      .repartition(3, col("b"))
      .write.mode("overwrite").parquet(dir)
    val out = Layout.fileStats(spark, dir, "k")
    val nFiles = out.count()
    assert(nFiles >= 2L, s"fixture must span several files, got $nFiles")
    assert(out.rdd.getNumPartitions === nFiles.toInt,
      "footer scan must run one slice per file below the 64 cap")
  }

  test("fileStats requirePathToken: a foreign layout in the scratch dir fails loudly") {
    // the r9 z6/z3 hazard: two catalog entries sharing a scratch prefix
    // let one entry's fileStats silently list the OTHER entry's layout,
    // shifting bin arithmetic while rows/schema stayed green. The guard
    // turns that into an immediate failure naming the offending file.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fstats_guard").toString
    (0L until 100L).map(i => (i, i % 4)).toDF("k", "bucket")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    // expected scheme passes and sums to the table count
    val ok = Layout.fileStats(spark, dir, "k", requirePathToken = "bucket=")
    assert(ok.agg(org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0) === 100L)
    // a "foreign" file (different partition scheme) poisons the listing
    (0L until 7L).map(i => (i, "x")).toDF("k", "source")
      .coalesce(1).write.mode("append").partitionBy("source").parquet(dir)
    val e = intercept[IllegalStateException] {
      Layout.fileStats(spark, dir, "k", requirePathToken = "bucket=")
    }
    assert(e.getMessage.contains("bucket=") && e.getMessage.contains("foreign or stale"))
    // without the token the old silent-poisoning behavior is what you get
    val silent = Layout.fileStats(spark, dir, "k")
    assert(silent.agg(org.apache.spark.sql.functions.sum("n_rows")).head.getLong(0) === 107L)
  }

  test("bucketStats: plan input is invariant to physical file splits within a bucket") {
    // the r9/r10 z6 driver-only hash-red class: an environment that
    // legally splits one bucket into several files (maxRecordsPerFile,
    // AQE rebalance) keeps Σ-rows green but shifts per-FILE largest-
    // first bin packing. bucketStats collapses footers to one row per
    // bucket token, so the downstream compaction plan is a pure
    // function of the logical table whatever the file count.
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, i % 4)).toDF("k", "bucket")

    val oneFile = Files.createTempDirectory("graft_bs_one").toString
    df.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(oneFile)

    val split = Files.createTempDirectory("graft_bs_split").toString
    df.repartition(col("bucket"))
      .write.mode("overwrite").option("maxRecordsPerFile", 300)
      .partitionBy("bucket").parquet(split)

    def parquetFiles(dir: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    assert(parquetFiles(oneFile) === 4, "baseline layout must be one file per bucket")
    assert(parquetFiles(split) > 4, "split layout must have fragmented buckets")

    def bucketRows(dir: String): Seq[(Long, Long, Long, Long)] =
      Layout.bucketStats(
          Layout.fileStats(spark, dir, "k", requirePathToken = "bucket="))
        .select("bucket", "n_rows", "min_v", "max_v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    // the SPLIT-INVARIANCE property itself
    assert(bucketRows(split) === bucketRows(oneFile))

    // and the consumer the property exists for: identical compaction plans
    def plan(dir: String): Seq[(Long, Long)] =
      Layout.compactionPlan(
          Layout.bucketStats(
            Layout.fileStats(spark, dir, "k", requirePathToken = "bucket=")),
          targetRows = 1500L, tieCol = "min_v")
        .select(col("bucket").cast("long"), col("grp"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(plan(split) === plan(oneFile))
  }

  test("bucketStats: a member file with missing stats poisons the bucket interval to NULL") {
    // the per-file invariant skippingEffectiveness pins ('null stats
    // always candidates') must survive the per-bucket collapse: a
    // stats-less file can hold ANY value, so min/max over only the
    // stats-bearing members would silently narrow the interval and let
    // a probe skip a bucket that actually contains it
    import spark.implicits._
    val stats = Seq(
      ("x/bucket=0/f1.parquet", 10L, Some(5L), Some(10L)),
      ("x/bucket=0/f2.parquet", 10L, None, None), // could contain 42
      ("x/bucket=1/f3.parquet", 10L, Some(1L), Some(2L)))
      .toDF("file", "n_rows", "min_v", "max_v")
    val out = Layout.bucketStats(stats).collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(2), r.isNullAt(3), r.getLong(1)))).toMap
    assert(out(0L) === ((true, true, 20L)), "mixed bucket must poison to NULL")
    assert(out(1L) === ((false, false, 10L)), "all-stats bucket keeps its interval")
    // and the consumer treats the poisoned bucket as a permanent candidate
    val eff = Layout.skippingEffectiveness(Layout.bucketStats(stats), Seq(42L))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(eff === ((2L, 1L)), "probe 42: bucket 0 candidate (unknown), bucket 1 skipped")
  }

  test("skippingEffectiveness: inclusive bounds, null stats always candidates") {
    val spark = TestSpark.spark
    import spark.implicits._
    val stats = Seq(
      ("f1", 10L, Some(0L), Some(9L)),
      ("f2", 10L, Some(10L), Some(19L)),
      ("f3", 10L, None, None)) // stats missing → can never be skipped
      .toDF("file", "n_rows", "min_v", "max_v")
    val out = Layout.skippingEffectiveness(stats, Seq(9L, 10L, 50L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // probe 9: f1 (inclusive max) + f3 → 2 of 3; probe 10: f2
    // (inclusive min) + f3; probe 50: outside every interval, f3 only
    assert(out === Map(
      9L -> ((3L, 2L, 333L)),
      10L -> ((3L, 2L, 333L)),
      50L -> ((3L, 1L, 666L))), out.toString)
    intercept[IllegalArgumentException] {
      Layout.skippingEffectiveness(stats, Seq.empty)
    }
  }

  test("compactionPlan: big files sit alone, small files pack near target, ties by tieCol") {
    val spark = TestSpark.spark
    import spark.implicits._
    // sizes: 250 (>= target: own bin), then 90+90 (bin), 90+30 (bin), 10
    val stats = Seq(
      ("f_big", 250L, 0L, 0L), ("f_a", 90L, 1L, 0L), ("f_b", 90L, 2L, 0L),
      ("f_c", 90L, 3L, 0L), ("f_d", 30L, 4L, 0L), ("f_e", 10L, 5L, 0L))
      .toDF("file", "n_rows", "min_v", "max_v")
    val plan = Layout.compactionPlan(stats, targetRows = 180L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // cumsum order: f_big 250 | f_a 340 | f_b 430 | f_c 520 | f_d 550 | f_e 560
    // grp = (cum - own) div 180: 0, 1, 1, 2, 2, 3
    assert(plan === Map("f_big" -> 0L, "f_a" -> 1L, "f_b" -> 1L,
      "f_c" -> 2L, "f_d" -> 2L, "f_e" -> 3L), plan.toString)
    // equal sizes break ties on tieCol ascending — deterministic plan
    val tied = Seq(("x", 50L, 2L, 0L), ("y", 50L, 1L, 0L))
      .toDF("file", "n_rows", "min_v", "max_v")
    // target 40: the first-ordered file starts at 0 (bin 0), the
    // second starts at 50 (bin 1) — so the assignment reveals which
    // of the equal-sized files the tie order put first (min_v asc: y)
    val p2 = Layout.compactionPlan(tied, targetRows = 40L, tieCol = "min_v")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(p2 === Map("y" -> 0L, "x" -> 1L), p2.toString)
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(tied, targetRows = 0L)
    }
  }

  test("compaction: crowded partitions collapse to one file, quiet ones untouched") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    // partition a: fragmented (4 files); partition b: already compact (1 file)
    (1 to 40).map(i => (i.toLong, "a", i.toLong)).toDF("id", "part", "v")
      .repartition(4).write.mode("overwrite").partitionBy("part").parquet(root)
    (101 to 110).map(i => (i.toLong, "b", i.toLong)).toDF("id", "part", "v")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(root)

    def files(part: String): Map[String, (Long, Long)] = {
      val dir = new java.io.File(s"$root/part=$part")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    }
    assert(files("a").size === 4 && files("b").size === 1)
    val bBefore = files("b")
    Thread.sleep(1100)

    val before = spark.read.parquet(root).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val compacted = graft.pipeline.Layout.compactPartitions(spark, root, "part", maxFiles = 1)
    assert(compacted === Seq("a"), "only the fragmented partition compacts")
    assert(files("a").size === 1, "partition a must collapse to one file")
    assert(files("b") === bBefore, "partition b must keep its exact files")
    val after = spark.read.parquet(root).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "compaction must be content-neutral")
  }

  test("layoutAdvisor: weighted winner from measured skips, min-name tie break") {
    import spark.implicits._
    // layout A skips everything on col x (1000) and nothing on y;
    // layout B skips 500 on both. Weights decide the winner:
    // x-heavy (800/200) -> A scores 800 vs B 500; y-heavy flips it.
    val audit = Seq(
      ("A", "x", 1L, 10L, 0L, 1000L), ("A", "x", 2L, 10L, 0L, 1000L),
      ("A", "y", 1L, 10L, 10L, 0L), ("A", "y", 2L, 10L, 10L, 0L),
      ("B", "x", 1L, 10L, 5L, 500L), ("B", "x", 2L, 10L, 5L, 500L),
      ("B", "y", 1L, 10L, 5L, 500L), ("B", "y", 2L, 10L, 5L, 500L)
    ).toDF("layout", "column", "probe", "n_files", "n_candidates", "skip_milli")
    def run(wx: Long, wy: Long) = Layout
      .layoutAdvisor(audit, Map("x" -> wx, "y" -> wy))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getLong(6), r.getBoolean(7)))).toMap
    val xHeavy = run(800L, 200L)
    assert(xHeavy(("A", "x")) === ((1000L, 800L, true)))
    assert(xHeavy(("A", "y")) === ((0L, 800L, true)))
    assert(xHeavy(("B", "x")) === ((500L, 500L, false)))
    val yHeavy = run(200L, 800L)
    assert(yHeavy(("A", "x"))._3 === false && yHeavy(("B", "y"))._3 === true)
    // exact tie (500/500): A 500 vs B 500 -> min layout name wins
    val tie = run(500L, 500L)
    assert(tie(("A", "x")) === ((1000L, 500L, true)))
    assert(tie(("B", "x")) === ((500L, 500L, false)))
    intercept[IllegalArgumentException] {
      Layout.layoutAdvisor(audit, Map.empty)
    }
    intercept[IllegalArgumentException] {
      Layout.layoutAdvisor(audit, Map("x" -> 1001L))
    }
  }

  test("bucketedTableCached: param change against an existing cache forces a rebuild") {
    import spark.implicits._
    // the silent-wrong-rows hazard (advisor r13): re-registering a
    // CLUSTERED BY claim over files physically written with DIFFERENT
    // (keyCol, buckets, schema) — the params marker must force a
    // rebuild on any mismatch, and must NOT rebuild when params match
    val root = Files.createTempDirectory("graft_bcache").toString
    val path = s"$root/t"
    val data = (0L until 64L).map(i => (i, s"v$i")).toDF("k", "s")
    def call(keyCol: String, buckets: Int, proj: Seq[String]) =
      Layout.bucketedTableCached(
        spark, data.select(proj.map(col): _*), "graft_bcache_spec",
        keyCol, buckets, path)
    def markerText: String = new String(
      Files.readAllBytes(new java.io.File(path, "_GRAFT_BUCKET_PARAMS").toPath),
      java.nio.charset.StandardCharsets.UTF_8)

    assert(call("k", 4, Seq("k", "s")).count() === 64L)
    assert(markerText.startsWith("v1|k|4|"))
    // sentinel survives a params-matching second call (cache HIT, no
    // overwrite); vanishes on any params mismatch (overwrite rebuild)
    // underscore-prefixed so Spark's file listing ignores it: the
    // advisor-r14 fix re-registers (and re-LISTS) the table on every
    // cache hit — a foreign visible file in a parquet dir correctly
    // fails the scan now, but the sentinel's only job is to prove
    // reuse-vs-rebuild on DISK, which _-invisibility doesn't change
    // (the Overwrite rebuild still clears it)
    val sentinel = new java.io.File(path, "_probe_sentinel.txt")
    def plant(): Unit = { val w = new java.io.PrintWriter(sentinel); w.print("x"); w.close() }
    plant()
    assert(call("k", 4, Seq("k", "s")).count() === 64L)
    assert(sentinel.exists(), "matching params must reuse the cache")

    assert(call("k", 8, Seq("k", "s")).count() === 64L) // buckets 4 -> 8
    assert(!sentinel.exists(), "buckets change must rebuild the files")
    assert(markerText.startsWith("v1|k|8|"))
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    val nBuckets = spark.table("graft_bcache_spec").queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case r: HadoopFsRelation => r.bucketSpec.map(_.numBuckets)
        case _ => None
      }
    }.flatten
    assert(nBuckets === Some(8), "catalog claim must match the rebuilt layout")

    plant()
    assert(call("k", 8, Seq("k")).count() === 64L) // projection change
    assert(!sentinel.exists(), "schema change must rebuild the files")
    assert(!markerText.contains("`s`"))
    spark.sql("DROP TABLE IF EXISTS graft_bcache_spec")
  }
}
