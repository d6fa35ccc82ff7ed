#!/usr/bin/env python3
"""Fold mutation-campaign shard outputs (JSONL) into MUTATION_MATRIX.md.

Handles all three harnesses' record shapes: tools/mutate.py (engine
waves, comparator-scored), tools/mutate_serving.py (wave 3, ScalaTest-
scored, `stage` = prefilter/full), and tools/mutgen.py (auto-generated
comparison flips, family-subset prefilter + full-gate escalation).

Usage: python3 tools/mutation_report.py shard.jsonl [...]
"""
import json, sys, time


def main():
    recs = {}
    for path in sys.argv[1:]:
        for line in open(path):
            r = json.loads(line)
            recs[r["id"]] = r  # later shards win (re-runs supersede)
    rows = sorted(recs.values(), key=lambda r: r["id"])
    killed = [r for r in rows if r.get("status") == "KILLED"]
    survived = [r for r in rows
                if r.get("status") == "SURVIVED" and not r.get("explained")]
    explained = [r for r in rows
                 if (r.get("status") == "SURVIVED" and r.get("explained"))
                 or r.get("status") == "EXCLUDED_EQUIVALENT"]
    other = [r for r in rows if r.get("status") not in
             ("KILLED", "SURVIVED", "EXCLUDED_EQUIVALENT")]
    out = []
    out.append("# MUTATION_MATRIX — gate-sensitivity campaign (r12 task 1; waves 3-4 r13 tasks 1/4)")
    out.append("")
    out.append("Each row: one seeded single-site mutation and the verdict of its")
    out.append("scoring harness — engine waves run the FULL catalog gate")
    out.append("(tools/mutate.py; Verify + tools/check.py at sf0.01, driver order,")
    out.append("one JVM per mutant), the serving wave runs the ScalaTest suite")
    out.append("(tools/mutate_serving.py, prefilter + full escalation), and the")
    out.append("auto-generated comparison-flip wave (tools/mutgen.py) prefilters by")
    out.append("the mutated file's family entry subset then escalates survivors to")
    out.append("the full gate. KILLED = at least one check failed. A SURVIVED row")
    out.append("is a gate gap: fixed (oracle/suite strengthened, then re-killed")
    out.append("through the harness) or explained with verified evidence before")
    out.append("round close — never left bare.")
    out.append("")
    out.append(f"- date: {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}")
    out.append(f"- mutants: {len(rows)} — **{len(killed)} killed, "
               f"{len(survived)} unexplained survivors, "
               f"{len(explained)} explained (equivalent or suite-killed), "
               f"{len(other)} other**")
    out.append("")
    out.append("| mutant | site | mutation | status | entries failing (first few) |")
    out.append("|---|---|---|---|---|")
    for r in rows:
        kb = ", ".join(str(k) for k in r.get("killed_by", [])[:6])
        if r.get("kill_mode") == "verify_crash":
            kb = "(Verify crashed — every starved entry reds at the driver)"
        nf = r.get("n_fail")
        status = r.get("status", "?") + (f" ({nf})" if nf is not None else "")
        if r.get("stage"):
            status += f" @{r['stage']}"
        note = r.get("note") or (
            f"auto flip `{r['tok']}` at {r.get('file','?').split('/')[-1]}:{r.get('line','?')}"
            if r.get("tok") else "")
        out.append(f"| {r['id']} | `{r.get('file','?').split('/')[-1]}` "
                   f"| {note} | **{status}** | {kb} |")
    if survived:
        out.append("")
        out.append("## Survivors (gate gaps)")
        for r in survived:
            out.append(f"- **{r['id']}** — {r.get('note','')}: `{r['old']}` -> `{r['new']}`")
    if explained:
        out.append("")
        out.append("## Explained survivors (equivalent mutants / suite-killed sites)")
        out.append("")
        out.append("A SURVIVED verdict from the comparator harness is not a pass —")
        out.append("each of these carries verified evidence of WHY the comparator")
        out.append("cannot see it (result-equivalent branch selection, or a")
        out.append("spec-pinned parity twin killed by `sbt test` instead):")
        for r in explained:
            why = r.get("explained") or r.get("note", "")
            out.append(f"- **{r['id']}** ({r.get('file','?').split('/')[-1]}:{r.get('line','?')}) — {why}")
    print("\n".join(out))


if __name__ == "__main__":
    main()
