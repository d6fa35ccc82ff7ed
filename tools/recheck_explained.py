#!/usr/bin/env python3
"""Argument-rot guard (r14 verdict task 1, standing): the mutation
matrix carries explained SURVIVED rows whose explanation is an
equivalence ARGUMENT (result-equivalent branch selection, provably
dead disjunct, tie algebra), not a machine kill. Arguments rot as code
changes. This guard re-applies each explained mutant on today's HEAD
and re-scores it through the full-catalog gate:

  - SURVIVED  -> the argument still holds (expected).
  - KILLED    -> the code around the site changed enough that the
                 flip now has observable effect: the r14 explanation
                 is STALE and must be re-written or the row re-classed
                 as a genuine kill. Exit 1.
  - SITE_DRIFTED (old text no longer occurs exactly once) -> the site
                 itself changed; the explanation must be re-verified
                 by a human. Exit 1.

Sites live in receipts/explained_ids.json (extracted verbatim from the
r14 receipts; apply is by old-text match, not line number, so routine
edits elsewhere in the file don't invalidate the manifest).

Usage (own worktree, mutgen.py discipline — precheck, add-opens JVM):
  git worktree add /tmp/graft_rmut HEAD
  ln -sfn /root/testdata/sf0.01 /tmp/graft_sf_rmut
  python3 tools/recheck_explained.py --worktree /tmp/graft_rmut \
      --sfdir /tmp/graft_sf_rmut --out receipts/explained_recheck_r15.jsonl
"""
import argparse, json, os, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mutgen  # gate machinery + environment discipline

REPO = mutgen.REPO


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worktree", required=True)
    ap.add_argument("--sfdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ids", default="")
    args = ap.parse_args()
    manifest = json.load(open(os.path.join(REPO, "receipts/explained_ids.json")))
    ids = set(x for x in args.ids.split(",") if x)
    todo = [m for m in manifest if not ids or m["id"].split("_")[0] in ids
            or m["id"] in ids]
    wt, sfdir = args.worktree, args.sfdir
    dirty = mutgen.sh(["git", "status", "--porcelain"], cwd=wt).stdout.strip()
    if dirty:
        print(f"worktree dirty:\n{dirty}", file=sys.stderr)
        sys.exit(2)
    env = dict(os.environ, GRAFT_SKIP_MANIFEST="1", SPARK_GRAFT_CPUS="4")
    cp = f"{wt}/target/scala-2.13/classes:{mutgen.SPARK_JARS}/*"
    outdir = f"/tmp/graft_rmut_out_{os.path.basename(wt)}"
    c = mutgen.sh("sbt -batch compile", cwd=wt, timeout=1800)
    if c.returncode != 0:
        print("PRECHECK compile failed", file=sys.stderr)
        print((c.stdout + c.stderr)[-800:], file=sys.stderr)
        sys.exit(3)
    sentinels = ["a22s_lateness_stream", "w11s_cusum_stream", "t9_time_gate"]
    killed, _, kb, detail = mutgen.gate(wt, sfdir, outdir, sentinels, env, cp)
    if killed:
        print(f"PRECHECK FAILED — environment broken ({kb}): {detail}",
              file=sys.stderr)
        sys.exit(3)
    print("== precheck clean", flush=True)
    rot = 0
    for m in todo:
        print(f"== {m['id']} ({m['file']})", flush=True)
        rec = dict(m)
        t0 = time.time()
        path = os.path.join(wt, m["file"])
        src = open(path).read()
        n = src.count(m["old"])
        if n != 1:
            rec.update(status="SITE_DRIFTED", occurrences=n)
            rot += 1
        else:
            open(path, "w").write(src.replace(m["old"], m["new"]))
            try:
                c = mutgen.sh("sbt -batch compile", cwd=wt, timeout=1800)
                if c.returncode != 0:
                    rec.update(status="COMPILE_FAIL",
                               detail=(c.stdout + c.stderr)[-400:])
                    rot += 1
                else:
                    killed, nf, kb, detail = mutgen.gate(
                        wt, sfdir, outdir, [], env, cp)
                    if killed:
                        rec.update(status="KILLED_NOW", n_fail=nf,
                                   killed_by=kb, detail=detail)
                        rot += 1
                    else:
                        rec.update(status="SURVIVED")  # argument holds
            finally:
                subprocess.run(["git", "checkout", "--", m["file"]],
                               cwd=wt, check=True)
        rec["secs"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"   -> {rec['status']}", flush=True)
    if rot:
        print(f"ARGUMENT ROT: {rot} explained mutants changed verdict — "
              "re-verify their matrix explanations", file=sys.stderr)
        sys.exit(1)
    print("== all explained survivors re-verified (arguments hold)")


if __name__ == "__main__":
    main()
