#!/usr/bin/env python3
"""Gate-sensitivity mutation campaign (r12 verdict task 1).

Three all-green rounds moved the binding risk from the engine to the
ORACLE CORPUS: a comparator blind spot (the r9-r11 HUGEINT saga) or an
oracle that cannot actually fail would be invisible. This harness
proves each part of the gate can kill a real engine bug: it applies
N seeded single-site mutations to operator code — one at a time, each
the shape of a bug a human writes (flipped bound, dropped band,
off-by-one window, wrong null order, truncated merge) — runs the FULL
269-entry catalog gate per mutant, and records the kill matrix.

A mutant is KILLED when >=1 catalog entry fails the driver comparator
(or Verify crashes outright). A SURVIVOR is a finding about the gate,
not a pass: its oracle must be strengthened (or the survival explained
with evidence — e.g. the mutated branch is provably unreachable on the
driver-fixed testdata) before the round closes.

Usage (run from a dedicated worktree so the main tree stays clean):
  git worktree add /tmp/graft_mut_a HEAD && cd /tmp/graft_mut_a
  ln -sfn /root/testdata/sf0.01 /tmp/graft_sf_mut_a     # scratch isolation:
    # scopedTmp keys /tmp paths on the DATA DIR STRING, so giving each
    # concurrent worker its own symlinked dir name prevents collisions
  python3 tools/mutate.py --worktree /tmp/graft_mut_a \
      --sfdir /tmp/graft_sf_mut_a --out /tmp/mutants_a.jsonl \
      --ids m01,m02,...
Results accumulate as JSON lines; tools/mutation_report.py folds the
shards into MUTATION_MATRIX.md.
"""
import argparse, json, os, re, subprocess, sys, time

# Each mutant: (id, file, old, new, note). `old` must occur EXACTLY once.
# Sites span every oracle family in SURVEY.md §2 + the pipeline catalog:
# state, streaming state, dedup/LSH, sketches, funnels, as-of, layout,
# ANN, clustering, text, sampling, views, graph, monitoring, replay.
MUTANTS = [
    ("m01_timegate_bound", "src/main/scala/graft/state/StateOps.scala",
     "df.filter(col(tsCol) >= lit(notBefore))",
     "df.filter(col(tsCol) > lit(notBefore))",
     "T9 time gate: >= flipped to > (boundary tick dropped)"),
    ("m02_scan_null_order", "src/main/scala/graft/state/StateOps.scala",
     "state.orderBy((keys ++ tieBreak).map(k => col(k).asc_nulls_first): _*)",
     "state.orderBy((keys ++ tieBreak).map(k => col(k).asc_nulls_last): _*)",
     "T2 state scan: ASC NULLS FIRST -> NULLS LAST (reference contract)"),
    ("m03_last_min", "src/main/scala/graft/state/StateOps.scala",
     ".agg(max(packed).as(\"_last\"))",
     ".agg(min(packed).as(\"_last\"))",
     "T1 last-by-key: keeps FIRST tick instead of last"),
    ("m04_lsh_band_drop", "src/main/scala/graft/pipeline/Dedup.scala",
     "explode(array((0 until bands).map(b =>",
     "explode(array((0 until math.max(1, bands - 1)).map(b =>",
     "MinHash LSH: one band dropped (near-dup recall silently shrinks)"),
    ("m05_qsketch_merge_trunc", "src/main/scala/graft/functions/QuantileSketch.scala",
     "var h = 0\n    while (h < o.levels.size) {",
     "var h = 0\n    while (h < o.levels.size - 1) {",
     "KLL merge: top level of the incoming sketch silently dropped"),
    ("m06_funnel_same_ts", "src/main/scala/graft/operators/EventAnalytics.scala",
     ".rangeBetween(Window.unboundedPreceding, -1)",
     ".rangeBetween(Window.unboundedPreceding, 0)",
     "funnel dominance prefilter: same-timestamp events leak into the strict-before frame"),
    ("m07_hash_sample_off1", "src/main/scala/graft/pipeline/Curation.scala",
     "def hashSample(idCol: String, pct: Int): Column =\n    TextFunctions.polyHash(col(idCol).cast(\"string\")) % 100 < pct",
     "def hashSample(idCol: String, pct: Int): Column =\n    TextFunctions.polyHash(col(idCol).cast(\"string\")) % 100 <= pct",
     "p1 hash sample: off-by-one keeps pct+1 percent"),
    ("m08_pack_shard_mod", "src/main/scala/graft/pipeline/Curation.scala",
     ".withColumn(\"shard\", pmod(col(\"_h\"), lit(shards)))",
     ".withColumn(\"shard\", pmod(col(\"_h\"), lit(shards + 1)))",
     "p2 token packing: wrong shard modulus reshuffles pack boundaries"),
    ("m09_asof_first", "src/main/scala/graft/operators/AsofJoin.scala",
     "last(col(\"_r\"), ignoreNulls = true).over(w)",
     "first(col(\"_r\"), ignoreNulls = true).over(w)",
     "as-of join: matches EARLIEST right row instead of latest <= t"),
    ("m10_zvalue_bitpos", "src/main/scala/graft/pipeline/Layout.scala",
     "shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * m + (m - 1 - j))",
     "shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * m + j)",
     "z-order: column significance reversed in the interleave"),
    ("m11_components_max", "src/main/scala/graft/pipeline/Dedup.scala",
     ".groupBy(\"a\").agg(min(col(\"b\")).as(\"m\"))",
     ".groupBy(\"a\").agg(max(col(\"b\")).as(\"m\"))",
     "connected components: neighborhood min -> max stalls the contraction"),
    ("m12_countmin_width", "src/main/scala/graft/functions/CountMin.scala",
     "width: Int = 1 << 14,",
     "width: Int = 1 << 4,",
     "count-min: 16-counter rows collide massively (estimates inflate)"),
    ("m13_distinct_early_degrade", "src/main/scala/graft/functions/DistinctSketch.scala",
     "exact.add(v)\n      if (exact.size > k) degrade()",
     "exact.add(v)\n      if (exact.size > k / 64) degrade()",
     "distinct sketch: exact tier 64x smaller (estimates where oracle expects exact)"),
    ("m14_tokens_split", "src/main/scala/graft/functions/TextFunctions.scala",
     "def tokens(text: Column): Column = split(text, \" \")",
     "def tokens(text: Column): Column = split(text, \"  \")",
     "tokenizer: splits on double-space (docs become one giant token)"),
    ("m15_langid_label", "src/main/scala/graft/functions/TextFunctions.scala",
     ".when(en >= de && en >= fr && en >= es, lit(\"en\"))",
     ".when(en >= de && en >= fr && en >= es, lit(\"de\"))",
     "language id: english docs labeled de"),
    ("m16_view_limit_off1", "src/main/scala/graft/operators/Views.scala",
     "v.limit.foreach(n => d = d.limit(n))",
     "v.limit.foreach(n => d = d.limit(n + 1))",
     "A6 row limit: off-by-one retains one extra row"),
    ("m17_ivf_farthest", "src/main/scala/graft/pipeline/Similarity.scala",
     "struct((-cosine(vec, ct.getField(\"ce\"))).as(\"nc\"),",
     "struct((cosine(vec, ct.getField(\"ce\"))).as(\"nc\"),",
     "IVF nprobe: probes the FARTHEST cells (recall collapses)"),
    ("m18_kmeans_cell0", "src/main/scala/graft/pipeline/Clustering.scala",
     "assignCell(col(vecCol), cents).as(\"_cell\"))\n      .filter(col(\"_cell\") >= 0)",
     "assignCell(col(vecCol), cents).as(\"_cell\"))\n      .filter(col(\"_cell\") > 0)",
     "k-means: cell 0's points excluded from centroid updates"),
    ("m19_stream_seq_tie", "src/main/scala/graft/streaming/StreamingState.scala",
     "if (a.getLong(seqIdx) >= b.getLong(seqIdx)) a else b",
     "if (a.getLong(seqIdx) <= b.getLong(seqIdx)) a else b",
     "streaming last-by-key: keeps the OLDEST row per batch"),
    ("m20_kcore_selfloop", "src/main/scala/graft/pipeline/GraphOps.scala",
     ".filter(col(\"src\") =!= col(\"dst\"))",
     ".filter(col(\"src\") === col(\"dst\"))",
     "k-core: keeps only self-loops (graph empties)"),
    ("m21_opsgenie_level", "src/main/scala/graft/operators/Monitoring.scala",
     ".when(level === \"WARNING\", lit(\"P3\"))",
     ".when(level === \"WARNING\", lit(\"P2\"))",
     "vendor payload: WARNING mapped to the wrong OpsGenie priority"),
    ("m22_replay_start_bound", "src/main/scala/graft/streaming/EngineLog.scala",
     "if (startTime.forall(cycleTs >= _)) channels.foreach { ch =>",
     "if (startTime.forall(cycleTs > _)) channels.foreach { ch =>",
     "late replay: cycle exactly at startTime silently dropped"),
    ("m23_unroll_outer", "src/main/scala/graft/operators/Transforms.scala",
     "df.withColumn(as, explode(col(listCol))).drop(listCol)",
     "df.withColumn(as, explode_outer(col(listCol))).drop(listCol)",
     "X2 unroll: explode -> explode_outer (empty baskets emit a null row)"),
    ("m24_simhash_majority", "src/main/scala/graft/pipeline/Dedup.scala",
     "when(ones * lit(2) > n, lit(1L << b)).otherwise(lit(0L))",
     "when(ones * lit(2) >= n, lit(1L << b)).otherwise(lit(0L))",
     "declarative simhash: majority tie sets the bit (drifts from the native expr + oracle)"),
    # ---- wave 2 (r13): families wave 1 did not touch --------------------
    ("m25_range_halfopen", "src/main/scala/graft/operators/RangeJoin.scala",
     "Seq(col(pointCol) >= col(loCol), col(pointCol) <= col(hiCol)))",
     "Seq(col(pointCol) >= col(loCol), col(pointCol) < col(hiCol)))",
     "range join: closed upper bound flipped half-open (boundary points dropped)"),
    ("m26_retention_cohort_max", "src/main/scala/graft/operators/EventAnalytics.scala",
     ".select(array_min(col(\"_ws\")).as(\"_cohort\"), explode(col(\"_ws\")).as(\"_active\"))",
     ".select(array_max(col(\"_ws\")).as(\"_cohort\"), explode(col(\"_ws\")).as(\"_active\"))",
     "retention: cohort anchored to LAST active period instead of first"),
    ("m27_bpe_fold_off1", "src/main/scala/graft/pipeline/Curation.scala",
     "when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),",
     "when(size(acc) > 1 && element_at(acc, -1) === lit(a) && s === lit(b),",
     "BPE merge fold: a merge at word position 1 never happens"),
    ("m28_transitions_lag2", "src/main/scala/graft/operators/EventAnalytics.scala",
     ".withColumn(\"_from\", lag(col(typeCol), 1).over(w))",
     ".withColumn(\"_from\", lag(col(typeCol), 2).over(w))",
     "transition matrix: skips one event (lag 2 instead of consecutive)"),
    ("m29_tags_kv_swap", "src/main/scala/graft/operators/Monitoring.scala",
     "concat(e.getField(\"key\"), lit(\":\"), e.getField(\"value\"))",
     "concat(e.getField(\"value\"), lit(\":\"), e.getField(\"key\"))",
     "vendor tags: key and value swapped in the k:v payload list"),
    ("m30_pq_subspace_off1", "src/main/scala/graft/pipeline/Similarity.scala",
     "argmaxCell(slice(vec, j * sub + 1, sub), centArr).as(s\"_c$j\")",
     "argmaxCell(slice(vec, j * sub + 2, sub), centArr).as(s\"_c$j\")",
     "PQ encode: subvector slice off by one (codes drift across all subspaces)"),
    ("m31_compaction_order", "src/main/scala/graft/pipeline/Layout.scala",
     ".orderBy(col(\"n_rows\").desc, col(tieCol).asc)",
     ".orderBy(col(\"n_rows\").asc, col(tieCol).asc)",
     "compaction plan: next-fit walks files smallest-first (bin assignment flips)"),
    ("m32_bmp_dispatch", "src/main/scala/graft/pipeline/Multimodal.scala",
     "payload(0) == 'B'.toByte && payload(1) == 'M'.toByte &&",
     "payload(0) == 'B'.toByte && payload(1) == 'N'.toByte &&",
     "media dispatch: BMP magic misread — no payload ever routes to the BMP decoder"),
    # ---- wave 3 (r14): crash-recovery resume path ------------------------
    ("m33_recovery_fresh_ckpt", "src/main/scala/graft/StreamingQueries.scala",
     "            q.stop()\n            q = startQ()",
     "            q.stop()\n            q = out.writeStream.outputMode(\"update\")\n"
     "              .option(\"checkpointLocation\", gateCheckpointDir(\"graft-sq-rckpt\"))\n"
     "              .foreachBatch(noop).start()",
     "crash recovery: restart loses the checkpoint (fresh dir) — recovered state "
     "diverges from the unbroken run; must be killed by t1r_state_recovery"),
]

SPARK_JARS = "/opt/spark/jars"

# Spark 4.x on JDK 17 outside spark-submit needs the module opens that
# build.sbt's javaOptions inject when sbt forks — running graft.Verify
# via bare `java -cp` without them breaks Kryo on ~9 streaming twins
# ("Unable to make field java.nio.ByteBuffer.hb accessible"), which
# poisoned the first campaign attempt with identical false kills across
# unrelated mutants. Keep in sync with build.sbt jdk17AddOpens.
JVM_OPTS = [o for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
] for o in ("--add-opens", f"{p}=ALL-UNNAMED")] + [
    "-Xmx8g", "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC"]


def sh(cmd, cwd=None, env=None, timeout=None):
    return subprocess.run(cmd, shell=isinstance(cmd, str), cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)


def scoped_tmp(prefix, sfdir):
    """Mirror PipelineQueries.scopedTmp: /tmp/{prefix}_{hex(javaHash & 0x7fffffff)}."""
    h = 0
    for ch in sfdir:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return f"/tmp/{prefix}_{format(h & 0x7FFFFFFF, 'x')}"


def apply_mutant(worktree, m):
    _id, relpath, old, new, _note = m
    path = os.path.join(worktree, relpath)
    src = open(path).read()
    n = src.count(old)
    if n != 1:
        raise RuntimeError(f"{_id}: site occurs {n} times (need exactly 1) in {relpath}")
    open(path, "w").write(src.replace(old, new))


def revert(worktree, relpath):
    subprocess.run(["git", "checkout", "--", relpath], cwd=worktree, check=True)


def run_one(worktree, sfdir, m, outdir):
    _id, relpath, old, new, note = m
    rec = {"id": _id, "file": relpath, "note": note, "old": old, "new": new}
    t0 = time.time()
    apply_mutant(worktree, m)
    try:
        c = sh("sbt -batch compile", cwd=worktree, timeout=1200)
        if c.returncode != 0:
            rec.update(status="COMPILE_FAIL",
                       detail=c.stdout[-800:] + c.stderr[-400:])
            return rec
        env = dict(os.environ,
                   GRAFT_SKIP_MANIFEST="1", SPARK_GRAFT_CPUS="4")
        cp = f"{worktree}/target/scala-2.13/classes:{SPARK_JARS}/*"
        sh(f"rm -rf {outdir}")
        # advisor r13: the graft_b1 CROSS-RUN cache persists across
        # mutants sharing one sfdir string — the bucketed-write path
        # would then execute only for the FIRST mutant (a mutant
        # corrupting that write masked as SURVIVED later; a corrupted
        # cache bleeding false kills into every subsequent mutant).
        # Every mutant rebuilds the layout from its own mutated code.
        sh(f"rm -rf {scoped_tmp('graft_b1', sfdir)}")
        v = sh(["java"] + JVM_OPTS + ["-cp", cp, "graft.Verify", sfdir, outdir],
               cwd=worktree, env=env, timeout=2400)
        if v.returncode != 0:
            # a Verify crash IS detection: the driver's gate would record
            # reds for every entry the crash starved of output
            rec.update(status="KILLED", kill_mode="verify_crash",
                       detail=(v.stderr or v.stdout)[-800:])
            return rec
        chk = sh(["python3", os.path.join(worktree, "tools/check.py"),
                  sfdir, outdir], timeout=1800)
        fails = [l for l in chk.stdout.splitlines() if l.startswith("FAIL ")]
        # entries the mutated engine crashed on surface as stderr lines
        # in Verify + missing outputs -> FAIL "no spark output" in check
        rec["n_fail"] = len(fails)
        rec["killed_by"] = [l.split()[1].rstrip(":") for l in fails][:12]
        rec["fail_lines"] = fails[:12]
        rec["summary"] = chk.stdout.splitlines()[-1] if chk.stdout else ""
        rec["status"] = "KILLED" if fails else "SURVIVED"
        return rec
    finally:
        revert(worktree, relpath)
        rec["secs"] = round(time.time() - t0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worktree", required=True)
    ap.add_argument("--sfdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--outdir", default=None,
                    help="Verify output dir (default: per-worktree)")
    ap.add_argument("--ids", default="",
                    help="comma-separated mutant ids (default: all)")
    args = ap.parse_args()
    ids = set(x for x in args.ids.split(",") if x)
    outdir = args.outdir or f"/tmp/graft_mut_out_{os.path.basename(args.worktree)}"
    todo = [m for m in MUTANTS if not ids or m[0] in ids]
    # clean slate: the worktree must have no local modifications
    dirty = sh(["git", "status", "--porcelain"], cwd=args.worktree).stdout.strip()
    if dirty:
        print(f"worktree dirty:\n{dirty}", file=sys.stderr)
        sys.exit(2)
    # harness self-test: the UNMUTATED tree must gate clean on a sentinel
    # subset (two Kryo-exercising streaming twins + one batch row) before
    # any mutant is scored — a broken run environment (the first campaign
    # attempt's missing --add-opens) must fail HERE, not masquerade as
    # kills across every mutant
    env = dict(os.environ, GRAFT_SKIP_MANIFEST="1", SPARK_GRAFT_CPUS="4")
    cp = f"{args.worktree}/target/scala-2.13/classes:{SPARK_JARS}/*"
    sentinels = ["a22s_lateness_stream", "w11s_cusum_stream", "t9_time_gate"]
    sh(f"rm -rf {outdir}")
    pv = sh(["java"] + JVM_OPTS + ["-cp", cp, "graft.Verify", args.sfdir, outdir]
            + sentinels, cwd=args.worktree, env=env, timeout=1200)
    pc = sh(["python3", os.path.join(args.worktree, "tools/check.py"),
             args.sfdir, outdir] + sentinels, timeout=600)
    if pv.returncode != 0 or pc.returncode != 0:
        print("PRECHECK FAILED — environment broken, refusing to score mutants:",
              file=sys.stderr)
        print((pv.stderr or "")[-600:], file=sys.stderr)
        print(pc.stdout[-600:], file=sys.stderr)
        sys.exit(3)
    print(f"== precheck clean ({', '.join(sentinels)})", flush=True)
    for m in todo:
        print(f"== {m[0]} ({m[4]})", flush=True)
        try:
            rec = run_one(args.worktree, args.sfdir, m, outdir)
        except Exception as e:
            rec = {"id": m[0], "status": "HARNESS_ERROR", "detail": str(e)}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"   -> {rec.get('status')} "
              f"n_fail={rec.get('n_fail', '-')} {rec.get('killed_by', '')[:6]}",
              flush=True)


if __name__ == "__main__":
    main()
