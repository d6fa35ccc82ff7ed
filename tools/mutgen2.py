#!/usr/bin/env python3
"""Auto-generated mutation wave 5 (r14 verdict task 1): extend the
mechanical campaign beyond comparison flips and beyond the three
r13-wave directories.

Two new axes, exactly the ungenerated human-bug classes the r14
verdict names:

  (a) ARITHMETIC / OFF-BY-ONE mutations — ` + 1` <-> ` - 1`,
      ` until ` <-> ` to ` (the canonical Scala off-by-one),
      `math.min(` <-> `math.max(`, ` * 2` <-> ` / 2` — over ALL
      operator directories (state/, operators/, pipeline/ AND the
      new ones below).  Wave 4 (tools/mutgen.py, g-ids) only flips
      relational comparisons; a merge that reads one element short
      or a range that excludes its last band is invisible to it.
  (b) NEW DIRECTORIES — functions/ (the TypedImperativeAggregate
      serialize/merge/eval paths in QuantileSketch, DistinctSketch,
      CountMin, HeavyHitters, ProfileSketch: a merge-path bug is
      exactly what survives comparison flips), streaming/
      (StreamingState fold arity / timeout handling, EngineLog,
      HotIndex), core/ — with comparison flips (wave-4 kind) AND the
      arithmetic kinds.

Site discipline is inherited verbatim from tools/mutgen.py (imported,
not copied): mutate only lines that occur exactly once in their file,
skip string-bearing/comment lines, tag multi-line require/assert
bodies as EXCLUDED_EQUIVALENT (error-shape only).

Scoring: same prefilter->escalate ladder as wave 4 — Verify+check.py
over the mutated file's FAMILY entry subset, full-catalog gate for
family-green mutants.  Files whose behavior the ORACLE GATE cannot
see (the serving runtime `streaming/ChannelRuntime.scala` and the
channel-graph/scratch plumbing in core/) are emitted as NEEDS_SUITE
records with the exact {id,file,old,new,note} shape that
`tools/mutate_serving.py --mutants-from` scores against the ScalaTest
suite — the r14 suite-scoring pipeline, now fed mechanically.

Ids use the `h` prefix (h000_...) so wave-4 `g` ids stay stable.

Usage:
  python3 tools/mutgen2.py --list
  git worktree add /tmp/graft_hmut HEAD
  ln -sfn /root/testdata/sf0.01 /tmp/graft_sf_hmut
  python3 tools/mutgen2.py --worktree /tmp/graft_hmut \
      --sfdir /tmp/graft_sf_hmut --out receipts/mutants_h.jsonl \
      [--cap 48] [--ids h007,...] [--kinds arith,cmp]
"""
import argparse, json, os, re, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mutgen  # wave-4 machinery: sh/gate/code_part/family_entries/JVM_OPTS

REPO = mutgen.REPO
SRC = mutgen.SRC

# cmp flips run only in the NEW dirs (wave 4 already owns the old three);
# arithmetic kinds run everywhere.
DIRS_CMP = [f"{SRC}/functions", f"{SRC}/streaming", f"{SRC}/core"]
DIRS_ARITH = [f"{SRC}/state", f"{SRC}/operators", f"{SRC}/pipeline"] + DIRS_CMP

# "STREAM" expands to the streaming-twin entries (…Ns_… names + the
# recovery drill) — the subset that exercises StreamingState/HotIndex.
STREAM_RE = re.compile(r"^[a-z]+\d+[a-z]*s_")
STREAM_EXTRA = ["t1r_state_recovery"]

FAMILIES2 = {
    # functions/ — sketch merge/eval paths + text kernels
    "BottomKSample.scala": ["p", "d"],
    "CountMin.scala": ["st"],
    "DistinctSketch.scala": ["st"],
    "GramMatrix.scala": ["c", "s"],
    "HeavyHitters.scala": ["st"],
    "NativeExpressions.scala": ["tx", "d"],
    "ProfileSketch.scala": ["st", "v"],
    "QuantileSketch.scala": ["st", "a", "k", "v", "w"],
    "TextFunctions.scala": ["tx", "d", "p"],
    "TopKBy.scala": ["st", "p"],
    # streaming/
    "StreamingState.scala": ["STREAM"],
    "EngineLog.scala": ["k", "j", "u"],
    "HotIndex.scala": ["c", "s"],
    "ChannelRuntime.scala": "SUITE",  # serving runtime — oracle-blind
    # core/ — plumbing; graph/scratch/serde are suite territory,
    # typed projection + id minting surface in x/k entries
    "Channels.scala": "SUITE",
    "IdGen.scala": ["x"],
    "Serde.scala": "SUITE",
    "Tables.scala": ["q", "a", "j"],
    "TypeProjection.scala": ["x", "k"],
    "Scratch.scala": "SUITE",
    # old dirs (arith kinds only) — same map as wave 4
    **mutgen.FAMILIES,
}

# Suites for NEEDS_SUITE scoring (mutate_serving.py --suites override):
SUITE_SUITES = {
    "ChannelRuntime.scala": ["graft.ChannelRuntimeSpec", "graft.GatewaySpec",
                             "graft.GatewayClientSpec", "graft.WebSocketSpec"],
    "Channels.scala": ["graft.ChannelGraphSpec", "graft.ChannelRuntimeSpec",
                       "graft.GatewaySpec"],
    "Serde.scala": ["graft.SourcesSinksSpec", "graft.ChannelRuntimeSpec"],
    "Scratch.scala": ["graft.ScratchSpec"],
}

# Arithmetic mutation kinds: (kind, finder-regex, flip map keyed on the
# captured token). Every pattern is a whitespace-delimited token so the
# textual rewrite is unambiguous (the wave-4 lesson on bare </>).
ARITH_KINDS = [
    # off-by-one: `x + 1` <-> `x - 1` (not `+= 1`, not `-1` literals,
    # not `+ 10`/`+ 1.5` — the lookbehind/lookahead pin a lone spaced 1)
    ("pm1", re.compile(r"(?<=[\w)\]]) ([+-]) 1(?![\d.a-zA-Z_])"),
     {"+": "-", "-": "+"}),
    # range off-by-one: `0 until n` <-> `0 to n`
    ("rng", re.compile(r"(?<=[\w)\]]) (until|to) (?=[\w(])"),
     {"until": "to", "to": "until"}),
    # extremum swap: math.min( <-> math.max(
    ("mm", re.compile(r"\b(math\.min|math\.max|Math\.min|Math\.max)(?=\()"),
     {"math.min": "math.max", "math.max": "math.min",
      "Math.min": "Math.max", "Math.max": "Math.min"}),
    # halve/double swap: ` / 2` <-> ` * 2`
    ("hd2", re.compile(r"(?<=[\w)\]]) ([*/]) 2(?![\d.a-zA-Z_])"),
     {"/": "*", "*": "/"}),
]


def enumerate_sites():
    sites = []
    seen_files = set()
    all_dirs = sorted(set(DIRS_CMP + DIRS_ARITH))
    for d in all_dirs:
        for fn in sorted(os.listdir(os.path.join(REPO, d))):
            if not fn.endswith(".scala"):
                continue
            fams = FAMILIES2.get(fn)
            if not fams:
                continue
            rel = f"{d}/{fn}"
            if rel in seen_files:
                continue
            seen_files.add(rel)
            do_cmp = d in DIRS_CMP and fn not in mutgen.EQUIVALENT_FILES
            text = open(os.path.join(REPO, rel)).read()
            lines = text.splitlines()
            for ln, line in enumerate(lines, 1):
                code = mutgen.code_part(line)
                if code is None:
                    continue
                if text.count(line) != 1:
                    continue  # old-occurs-once discipline
                prev = lines[max(0, ln - 4):ln - 1]
                require_body = any(
                    ("require(" in p or "assert(" in p)
                    and not p.rstrip().endswith(")") for p in prev)
                occ = 0
                muts = []
                if do_cmp:
                    for mt in mutgen.TOKEN_RE.finditer(code):
                        tok = mt.group(1)
                        muts.append(("cmp", mt.start(), mt.end(), tok,
                                     mutgen.FLIPS[tok]))
                for kind, rx, flips in ARITH_KINDS:
                    for mt in rx.finditer(code):
                        tok = mt.group(1)
                        muts.append((kind, mt.start(1), mt.end(1), tok,
                                     flips[tok]))
                for kind, s0, s1, tok, new_tok in muts:
                    new_line = line[:s0] + new_tok + line[s1:]
                    sites.append({
                        "file": rel, "line": ln, "occ": occ, "kind": kind,
                        "tok": tok, "new_tok": new_tok,
                        "old": line, "new": new_line,
                        "families": fams, "require_body": require_body,
                    })
                    occ += 1
    for i, s in enumerate(sites):
        s["id"] = (f"h{i:03d}_{os.path.basename(s['file']).removesuffix('.scala')}"
                   f"_L{s['line']}" + (f"_{s['occ']}" if s["occ"] else ""))
    return sites


def family_entries2(names, fams):
    out = set(mutgen.family_entries(names, [f for f in fams if f != "STREAM"]))
    if "STREAM" in fams:
        out |= {n for n in names if STREAM_RE.match(n)}
        out |= {n for n in STREAM_EXTRA if n in names}
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--worktree")
    ap.add_argument("--sfdir")
    ap.add_argument("--out")
    ap.add_argument("--ids", default="")
    ap.add_argument("--kinds", default="",
                    help="comma subset of cmp,pm1,rng,mm,hd2")
    ap.add_argument("--cap", type=int, default=0,
                    help="run at most N sites, round-robin across files "
                         "(0 = all); dropped count reported, never silent")
    args = ap.parse_args()
    sites = enumerate_sites()
    kinds = set(k for k in args.kinds.split(",") if k)
    if kinds:
        sites = [s for s in sites if s["kind"] in kinds]
    if args.list:
        from collections import Counter
        for s in sites:
            fam = s["families"] if s["families"] != "SUITE" else "SUITE"
            print(f"{s['id']}: [{s['kind']}] {s['tok']} -> {s['new_tok']}  "
                  f"{s['file']}:{s['line']}  {fam}"
                  + ("  REQUIRE_BODY" if s["require_body"] else ""))
        print(f"== {len(sites)} sites  "
              f"{dict(Counter(s['kind'] for s in sites))}  "
              f"{dict(Counter(os.path.basename(s['file']) for s in sites))}")
        return
    ids = set(x for x in args.ids.split(",") if x)
    todo = [s for s in sites if not ids or s["id"] in ids]
    if args.cap and len(todo) > args.cap:
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
    dirty = mutgen.sh(["git", "status", "--porcelain"], cwd=wt).stdout.strip()
    if dirty:
        print(f"worktree dirty:\n{dirty}", file=sys.stderr)
        sys.exit(2)
    env = dict(os.environ, GRAFT_SKIP_MANIFEST="1", SPARK_GRAFT_CPUS="4")
    cp = f"{wt}/target/scala-2.13/classes:{mutgen.SPARK_JARS}/*"
    outdir = f"/tmp/graft_hmut_out_{os.path.basename(wt)}"
    names = set(json.load(open(os.path.join(wt, "RECEIPTS_MANIFEST.json"))).keys())
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
    try:
        names |= set(json.load(open(os.path.join(outdir, "oracle_sql.json"))).keys())
    except Exception:
        pass
    names = sorted(names)
    print(f"== precheck clean ({', '.join(sentinels)}); {len(names)} catalog names",
          flush=True)
    for s in todo:
        print(f"== {s['id']} ([{s['kind']}] {s['tok']} -> {s['new_tok']} "
              f"at {s['file']}:{s['line']})", flush=True)
        rec = dict(s)
        rec["note"] = (f"auto [{s['kind']}] {s['tok']} -> {s['new_tok']} "
                       f"at {os.path.basename(s['file'])}:{s['line']}")
        if s.get("require_body"):
            rec.update(status="EXCLUDED_EQUIVALENT",
                       note="argument-validation bound inside a multi-line "
                            "require/assert: flipping changes error shape on "
                            "boundary inputs, never a result")
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print("   -> EXCLUDED_EQUIVALENT", flush=True)
            continue
        if s["families"] == "SUITE":
            rec.update(status="NEEDS_SUITE",
                       suites=SUITE_SUITES.get(os.path.basename(s["file"]), []))
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print("   -> NEEDS_SUITE (score via mutate_serving --mutants-from)",
                  flush=True)
            continue
        t0 = time.time()
        path = os.path.join(wt, s["file"])
        src = open(path).read()
        if src.count(s["old"]) != 1:
            rec.update(status="HARNESS_ERROR",
                       detail="site not unique at apply time")
        else:
            open(path, "w").write(src.replace(s["old"], s["new"]))
            try:
                import subprocess as _sp
                c = mutgen.sh("sbt -batch compile", cwd=wt, timeout=1800)
                if c.returncode != 0:
                    rec.update(status="COMPILE_FAIL",
                               detail=(c.stdout + c.stderr)[-400:])
                else:
                    fam = family_entries2(names, s["families"])
                    killed, nf, kb, detail = mutgen.gate(
                        wt, sfdir, outdir, fam, env, cp)
                    if killed:
                        rec.update(status="KILLED", stage="family",
                                   n_fail=nf, killed_by=kb, detail=detail)
                    else:
                        killed, nf, kb, detail = mutgen.gate(
                            wt, sfdir, outdir, [], env, cp)
                        if killed:
                            rec.update(status="KILLED", stage="full",
                                       n_fail=nf, killed_by=kb, detail=detail)
                        else:
                            rec.update(status="SURVIVED", stage="full")
            except _sp.TimeoutExpired as te:
                # A gate run 20x over its normal wall is a HANG, and a
                # mutant that hangs the engine is dead: the gate would
                # never go green under it. Record the kill with the
                # timed-out stage so the receipt is auditable (h005:
                # the DistinctSketch presize loop goes infinite when
                # the Int capacity doubles to negative under the
                # flipped bound).
                rec.update(status="KILLED", stage="timeout",
                           kill_mode="timeout",
                           detail=f"gate run exceeded {te.timeout:.0f}s "
                                  "(mutant hangs the engine)")
            finally:
                import subprocess
                subprocess.run(["git", "checkout", "--", s["file"]],
                               cwd=wt, check=True)
        rec["secs"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"   -> {rec.get('status')} [{rec.get('stage', '-')}] "
              f"n_fail={rec.get('n_fail', '-')} {str(rec.get('killed_by', ''))[:60]}",
              flush=True)


if __name__ == "__main__":
    main()
