#!/usr/bin/env python3
"""Bench run ledger (r14 verdict task 6): one machine-appended row per
full-catalog Bench run, so cross-artifact prose ("bench.json commits
the close run") always has a (git hash, date) lookup — the r14
builder-vs-driver ambiguity (199.4 s vs 223.6 s on identical HEAD,
two runs of the same jar) becomes a table row instead of a forensic
exercise.

Usage (after a full-catalog Bench run wrote ./bench.json):
  python3 tools/bench_trend.py --round 15 --source builder-close
  python3 tools/bench_trend.py --round 15 --source driver \
      --bench BENCH_r15.json          # driver artifact (parsed form)

Appends to the "## Bench run ledger" table in SCALE.md (creates the
section on first use). Skips (with a note) if an identical
(git, total, source) row is already present — re-runs of the tool are
idempotent, distinct runs of the same HEAD are distinct rows.
"""
import argparse, datetime, json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADER = "## Bench run ledger (machine-appended, tools/bench_trend.py)"
TABLE_HEAD = (
    "| round | source | git | date (UTC) | entries | total s | canary first/last | "
    "stream floor-ratio |\n"
    "|---|---|---|---|---|---|---|---|\n")


def load_bench(path):
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]  # driver BENCH_r*.json wraps the compact line
    total = d.get("value")
    if isinstance(total, float):
        total = round(total, 1)
    n = d.get("n") or (len(d.get("queries", {})) or len(d.get("q_ms", [])))
    return {
        "total": total, "n": n,
        "canary_first": d.get("canary_first"),
        "canary_last": d.get("canary_last"),
        "floor_ratio": d.get("stream_floor_ratio"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True)
    ap.add_argument("--source", required=True,
                    help="builder-close | driver | adhoc-<note>")
    ap.add_argument("--bench", default=os.path.join(REPO, "bench.json"))
    ap.add_argument("--git", default="",
                    help="override the hash (driver artifacts describe the "
                         "round-close HEAD, not necessarily the current one)")
    args = ap.parse_args()
    b = load_bench(args.bench)
    git = args.git or subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    date = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M")
    row = (f"| r{args.round} | {args.source} | {git} | {date} | {b['n']} | "
           f"{b['total']} | {b['canary_first']}/{b['canary_last']} | "
           f"{b['floor_ratio']} |\n")
    scale = os.path.join(REPO, "SCALE.md")
    text = open(scale).read()
    if HEADER not in text:
        text += (
            f"\n{HEADER}\n\n"
            "One row per full-catalog Bench run (who ran it, on which HEAD,\n"
            "when, and the run's own drift instruments) — the lookup that\n"
            "disambiguates builder-close vs driver runs of the same HEAD.\n"
            "Same-jar box band is documented above (r12: 198.8–220.0 s);\n"
            "compare totals only through the canary/floor instruments.\n\n"
            + TABLE_HEAD)
    key = f"| {args.source} | {git} | "
    dup = any(key in line and f"| {b['total']} |" in line
              for line in text.splitlines())
    if dup:
        print(f"row already present for (source={args.source}, git={git}, "
              f"total={b['total']}) — not appending")
        return
    text += row
    open(scale, "w").write(text)
    print("appended:", row.strip())


if __name__ == "__main__":
    main()
