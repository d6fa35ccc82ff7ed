#!/usr/bin/env python3
"""Auto-generated mutation wave (r13 verdict task 4): mechanically flip
relational comparisons in `state/`, `operators/`, `pipeline/` operator
code and score each flip against the gate — prefiltered by the mutated
file's FAMILY entry subset (fast), escalating only prefilter-survivors
to the FULL catalog gate.

Site discipline: a mutant is generated only when the mutated source
LINE occurs exactly once in its file (the `old`-occurs-once rule that
makes textual apply/revert safe), and only for lines that are plainly
operator code (string literals, comments, and require() guards are
skipped — flipping a require bound changes error shape, not results,
and flipping text inside a quoted oracle would mutate the ORACLE).

Scoring (same environment discipline as tools/mutate.py — add-opens
JVM flags, sentinel precheck, per-mutant b1-cache clear):
  1. PREFILTER: Verify + check.py over the family's entry subset.
     Any FAIL -> KILLED (stage=family).
  2. ESCALATE: family-green mutants run the FULL catalog gate.
     FAIL -> KILLED (stage=full); green -> SURVIVED (a gate gap to
     close or explain before round close).

Usage:
  python3 tools/mutgen.py --list                  # enumerate sites
  git worktree add /tmp/graft_gmut HEAD
  ln -sfn /root/testdata/sf0.01 /tmp/graft_sf_gmut
  python3 tools/mutgen.py --worktree /tmp/graft_gmut \
      --sfdir /tmp/graft_sf_gmut --out receipts/mutants_gen.jsonl \
      [--cap 45] [--ids g007,...]
"""
import argparse, json, os, re, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "src/main/scala/graft"
DIRS = [f"{SRC}/state", f"{SRC}/operators", f"{SRC}/pipeline"]

# file basename prefix -> catalog entry families (entry-name leading
# alpha run, e.g. d3e -> "d", tx15c -> "tx", st7s -> "st")
FAMILIES = {
    "StateOps.scala": ["t"], "StateQuery.scala": ["t"],
    "StateFastPath.scala": ["t"], "Views.scala": ["a", "q"],
    "EventAnalytics.scala": ["a", "w", "v"], "Transforms.scala": ["x"],
    "AsofJoin.scala": ["j"], "RangeJoin.scala": ["j"],
    "Monitoring.scala": ["k"], "Dedup.scala": ["d"],
    "Similarity.scala": ["s"], "Clustering.scala": ["c"],
    "Curation.scala": ["p", "tx"], "Layout.scala": ["z", "b"],
    "GraphOps.scala": ["g"], "Multimodal.scala": ["mm"],
    "Pca.scala": ["c"], "TopKBy.scala": ["st", "p"],
}

# Files whose comparison sites are EQUIVALENT MUTANTS by construction:
# StateFastPath's guards (castLiteral bounds, orderability checks) gate
# a fast path whose contract is result-parity with the Spark fallback —
# every stricter-guard flip just reroutes to the fallback and returns
# IDENTICAL results (g000 ran the full catalog gate and SURVIVED for
# exactly this reason; g001's sibling site was killed mid-run after the
# analysis). Path-selection behavior is pinned by StateFastPathSpec's
# parity tests, not the oracle gate. Sites here are enumerated (ids
# stay stable) but recorded as EXCLUDED_EQUIVALENT instead of run.
EQUIVALENT_FILES = {"StateFastPath.scala"}

FLIPS = {">=": ">", "<=": "<", "=!=": "===", "===": "=!="}
# note: bare > and < are NOT flipped to >=/<= blindly — Scala generics
# (Map[String, X]) and shift ops make bare-angle rewrites unsafe to do
# textually; the compound operators above are unambiguous tokens.
TOKEN_RE = re.compile(r"(>=|<=|=!=|===)")

SPARK_JARS = "/opt/spark/jars"
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


def code_part(line):
    """Strip line comments; None if the line is unusable (string
    literals or comment-only — flipping inside either is meaningless
    or oracle-mutating)."""
    s = line
    if '"' in s:
        return None
    i = s.find("//")
    if i >= 0:
        s = s[:i]
    t = s.strip()
    if not t or t.startswith("*") or t.startswith("/*"):
        return None
    if "require(" in t or "assert(" in t:
        return None
    return s


def enumerate_sites():
    sites = []
    for d in DIRS:
        for fn in sorted(os.listdir(os.path.join(REPO, d))):
            if not fn.endswith(".scala"):
                continue
            fams = FAMILIES.get(fn)
            if not fams:
                continue
            rel = f"{d}/{fn}"
            text = open(os.path.join(REPO, rel)).read()
            lines = text.splitlines()
            for ln, line in enumerate(lines, 1):
                code = code_part(line)
                if code is None:
                    continue
                # multi-line require()/assert() bodies (g045-g050 class):
                # a require/assert opened in the preceding few lines and
                # not yet closed means this line is a validation bound —
                # error-shape only. Tag (NOT skip): ids are positional,
                # so enumeration must stay stable across policy changes;
                # main() records tagged sites as EXCLUDED_EQUIVALENT.
                prev = lines[max(0, ln - 4):ln - 1]
                require_body = any(
                    ("require(" in p or "assert(" in p)
                    and not p.rstrip().endswith(")") for p in prev)
                toks = list(TOKEN_RE.finditer(code))
                if not toks:
                    continue
                if text.count(line) != 1:
                    continue  # old-occurs-once discipline
                for k, mt in enumerate(toks):
                    tok = mt.group(1)
                    new_line = (line[:mt.start()] + FLIPS[tok]
                                + line[mt.end():])
                    sites.append({
                        "file": rel, "line": ln, "occ": k, "tok": tok,
                        "old": line, "new": new_line, "families": fams,
                        "require_body": require_body,
                    })
    for i, s in enumerate(sites):
        s["id"] = f"g{i:03d}_{os.path.basename(s['file']).removesuffix('.scala')}_L{s['line']}" + (
            f"_{s['occ']}" if s["occ"] else "")
    return sites


def sh(cmd, cwd=None, env=None, timeout=None):
    return subprocess.run(cmd, shell=isinstance(cmd, str), cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)


def scoped_tmp(prefix, sfdir):
    h = 0
    for ch in sfdir:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return f"/tmp/{prefix}_{format(h & 0x7FFFFFFF, 'x')}"


def family_entries(names, fams):
    out = []
    for n in sorted(names):
        lead = re.match(r"[a-z]+", n)
        if lead and lead.group(0) in fams:
            out.append(n)
    return out


def gate(worktree, sfdir, outdir, entries, env, cp):
    """Verify + check over `entries` (empty = full catalog). Returns
    (killed, n_fail, killed_by, detail)."""
    sh(f"rm -rf {outdir}")
    sh(f"rm -rf {scoped_tmp('graft_b1', sfdir)}")
    v = sh(["java"] + JVM_OPTS + ["-cp", cp, "graft.Verify", sfdir, outdir]
           + entries, cwd=worktree, env=env, timeout=2400)
    if v.returncode != 0:
        return True, -1, ["verify_crash"], (v.stderr or v.stdout)[-600:]
    chk = sh(["python3", os.path.join(worktree, "tools/check.py"),
              sfdir, outdir] + entries, timeout=1800)
    fails = [l for l in chk.stdout.splitlines() if l.startswith("FAIL ")]
    return (bool(fails), len(fails),
            [l.split()[1].rstrip(":") for l in fails][:12], "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--worktree")
    ap.add_argument("--sfdir")
    ap.add_argument("--out")
    ap.add_argument("--ids", default="")
    ap.add_argument("--cap", type=int, default=0,
                    help="run at most N sites, spread deterministically "
                         "across files (0 = all); the dropped count is "
                         "reported — no silent truncation")
    args = ap.parse_args()
    sites = enumerate_sites()
    if args.list:
        for s in sites:
            print(f"{s['id']}: {s['tok']} -> {FLIPS[s['tok']]}  {s['file']}:{s['line']}")
        print(f"== {len(sites)} sites")
        return
    ids = set(x for x in args.ids.split(",") if x)
    todo = [s for s in sites if not ids or s["id"] in ids]
    if args.cap and len(todo) > args.cap:
        # deterministic spread: round-robin across files so the cap
        # samples every family, not just the first file alphabetically
        byfile = {}
        for s in todo:
            byfile.setdefault(s["file"], []).append(s)
        picked, rng = [], sorted(byfile.values(), key=lambda v: v[0]["file"])
        i = 0
        while len(picked) < args.cap:
            added = False
            for v in rng:
                if i < len(v) and len(picked) < args.cap:
                    picked.append(v[i]); added = True
            if not added:
                break
            i += 1
        print(f"== cap {args.cap}: running {len(picked)} of {len(todo)} sites "
              f"({len(todo) - len(picked)} enumerated-but-not-run this pass)",
              flush=True)
        todo = picked
    wt, sfdir = args.worktree, args.sfdir
    dirty = sh(["git", "status", "--porcelain"], cwd=wt).stdout.strip()
    if dirty:
        print(f"worktree dirty:\n{dirty}", file=sys.stderr)
        sys.exit(2)
    env = dict(os.environ, GRAFT_SKIP_MANIFEST="1", SPARK_GRAFT_CPUS="4")
    cp = f"{wt}/target/scala-2.13/classes:{SPARK_JARS}/*"
    outdir = f"/tmp/graft_gmut_out_{os.path.basename(wt)}"
    # catalog names for family subsets: the committed gate manifest,
    # UNIONED with the sentinel run's oracle_sql.json (Verify dumps the
    # full current oracle map on every run) — so entries added since
    # the last committed gate still join their family's prefilter
    # instead of forcing a full-gate escalation to be seen
    names = set(json.load(open(os.path.join(wt, "RECEIPTS_MANIFEST.json"))).keys())
    # environment precheck (mutate.py discipline): unmutated tree must
    # gate clean on the Kryo-exercising sentinels before scoring anything
    c = sh("sbt -batch compile", cwd=wt, timeout=1800)
    if c.returncode != 0:
        print("PRECHECK compile failed", file=sys.stderr)
        print((c.stdout + c.stderr)[-800:], file=sys.stderr)
        sys.exit(3)
    sentinels = ["a22s_lateness_stream", "w11s_cusum_stream", "t9_time_gate"]
    killed, _, kb, detail = gate(wt, sfdir, outdir, sentinels, env, cp)
    if killed:
        print(f"PRECHECK FAILED — environment broken ({kb}): {detail}",
              file=sys.stderr)
        sys.exit(3)
    try:
        names |= set(json.load(open(os.path.join(outdir, "oracle_sql.json"))).keys())
    except Exception:
        pass
    names = sorted(names)
    print(f"== precheck clean ({', '.join(sentinels)}); {len(names)} catalog names",
          flush=True)
    for s in todo:
        print(f"== {s['id']} ({s['tok']} -> {FLIPS[s['tok']]} at {s['file']}:{s['line']})",
              flush=True)
        rec = dict(s)
        excluded_note = None
        if os.path.basename(s["file"]) in EQUIVALENT_FILES:
            excluded_note = ("fast-path guard: stricter flip reroutes to the "
                             "Spark fallback, results identical by the parity "
                             "contract (see EQUIVALENT_FILES)")
        elif s.get("require_body"):
            excluded_note = ("argument-validation bound inside a multi-line "
                             "require/assert: flipping changes error shape on "
                             "boundary inputs, never a result")
        if excluded_note:
            rec.update(status="EXCLUDED_EQUIVALENT", note=excluded_note)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print("   -> EXCLUDED_EQUIVALENT", flush=True)
            continue
        t0 = time.time()
        path = os.path.join(wt, s["file"])
        src = open(path).read()
        if src.count(s["old"]) != 1:
            rec.update(status="HARNESS_ERROR", detail="site not unique at apply time")
        else:
            open(path, "w").write(src.replace(s["old"], s["new"]))
            try:
                c = sh("sbt -batch compile", cwd=wt, timeout=1800)
                if c.returncode != 0:
                    rec.update(status="COMPILE_FAIL",
                               detail=(c.stdout + c.stderr)[-400:])
                else:
                    fam = family_entries(names, s["families"])
                    killed, nf, kb, detail = gate(wt, sfdir, outdir, fam, env, cp)
                    if killed:
                        rec.update(status="KILLED", stage="family",
                                   n_fail=nf, killed_by=kb, detail=detail)
                    else:
                        killed, nf, kb, detail = gate(wt, sfdir, outdir, [], env, cp)
                        if killed:
                            rec.update(status="KILLED", stage="full",
                                       n_fail=nf, killed_by=kb, detail=detail)
                        else:
                            rec.update(status="SURVIVED", stage="full")
            finally:
                subprocess.run(["git", "checkout", "--", s["file"]],
                               cwd=wt, check=True)
        rec["secs"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"   -> {rec.get('status')} [{rec.get('stage', '-')}] "
              f"n_fail={rec.get('n_fail', '-')} {rec.get('killed_by', '')[:6]}",
              flush=True)


if __name__ == "__main__":
    main()
