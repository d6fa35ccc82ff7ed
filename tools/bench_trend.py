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


def load_named(path, names_path=None):
    """Full named per-query table (seconds) from any bench artifact:
    a builder bench.json (named "queries" map), or a driver BENCH_r*.json
    whose parsed final line carries only the nameless sorted-name "q_ms"
    array — zipped with the committed BENCH_names.json sidecar (r15
    verdict task 1: the driver's comparator had n_common=0 because the
    names lived only in bench.json, which the driver's own run
    overwrites)."""
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    meta = {
        "canary_first": d.get("canary_first"),
        "canary_last": d.get("canary_last"),
        "twin_floor": d.get("twin_floor"),
        "total": d.get("value"),
    }
    if d.get("queries"):
        return {k: float(v) for k, v in d["queries"].items()}, meta
    q_ms = d.get("q_ms")
    if not q_ms:
        sys.exit(f"{path}: no 'queries' map and no 'q_ms' array")
    if d.get("order") and d["order"] != "sorted-name":
        sys.exit(f"{path}: unknown q_ms order {d['order']!r}")
    np = names_path or os.path.join(REPO, "BENCH_names.json")
    names = json.load(open(np))["names"]
    if len(names) < len(q_ms):
        sys.exit(f"{path}: {len(q_ms)} q_ms entries but only "
                 f"{len(names)} names in {np} — names sidecar predates "
                 f"this run's catalog")
    # an older, smaller catalog zips against the names PREFIX only when
    # the counts match after dropping names added later — refuse instead
    # of guessing: the caller passes the round's own sidecar via --names
    if len(names) > len(q_ms):
        sys.exit(f"{path}: {len(q_ms)} q_ms entries vs {len(names)} names "
                 f"in {np}; pass the matching round's sidecar via --names")
    return {n: v / 1000.0 for n, v in zip(names, q_ms)}, meta


def geomean(xs):
    import math
    xs = [x for x in xs if x and x > 0]
    if not xs:
        return None
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def compare(argv):
    """Per-query round-over-round comparison with drift normalization
    applied by the TOOL, not by prose (r15 verdict task 1). Emits the
    same keys the driver's PERF file carries (n_common, per_query,
    geomean) plus the canary/twin-floor-normalized geomeans."""
    ap = argparse.ArgumentParser(prog="bench_trend.py compare")
    ap.add_argument("--prev", required=True, help="previous round artifact "
                    "(BENCH_rNN.json or a bench.json)")
    ap.add_argument("--now", required=True, help="current artifact")
    ap.add_argument("--names", default=None,
                    help="names sidecar for q_ms zipping (default: "
                         "repo BENCH_names.json)")
    ap.add_argument("--names-prev", default=None,
                    help="sidecar for --prev when its catalog differs")
    ap.add_argument("--out", default=None, help="write full JSON report here")
    args = ap.parse_args(argv)
    prev, pm = load_named(args.prev, args.names_prev or args.names)
    now, nm = load_named(args.now, args.names)
    common = sorted(set(prev) & set(now))
    per_query = {}
    for k in common:
        p, n = prev[k], now[k]
        if p > 0 and n > 0:
            per_query[k] = {"prev_s": round(p, 3), "now_s": round(n, 3),
                            "speedup": round(p / n, 3)}
    sp = [v["speedup"] for v in per_query.values()]
    g = geomean(sp)
    # box-state factors: >1 means the NOW box was slower, so the raw
    # speedups UNDERSTATE real improvement by that factor. canary =
    # pure-compute synthetic (box ceiling); twin_floor = zero-data
    # streaming twin (harness fixed cost) — two independent instruments
    # bracketing the drift (the r15 verdict's own method).
    def factor(a, b):
        return (b / a) if (a and b and a > 0 and b > 0) else None
    cf = factor(pm["canary_first"], nm["canary_first"])
    ff = factor(pm["twin_floor"], nm["twin_floor"])
    report = {
        "n_common": len(per_query),
        "queries_dropped": sorted(set(prev) - set(now)),
        "queries_new": sorted(set(now) - set(prev)),
        "geomean_speedup_raw": round(g, 4) if g else None,
        "canary_factor_now_over_prev": round(cf, 3) if cf else None,
        "floor_factor_now_over_prev": round(ff, 3) if ff else None,
        "geomean_speedup_canary_norm":
            round(g * cf, 4) if (g and cf) else None,
        "geomean_speedup_floor_norm":
            round(g * ff, 4) if (g and ff) else None,
        "total_prev": pm["total"], "total_now": nm["total"],
        "n_regressed_raw": sum(1 for s in sp if s < 0.9),
        "n_improved_raw": sum(1 for s in sp if s > 1.1),
        "top_improvements": sorted(
            ((k, v["speedup"]) for k, v in per_query.items()),
            key=lambda t: -t[1])[:10],
        "top_regressions": sorted(
            ((k, v["speedup"]) for k, v in per_query.items()),
            key=lambda t: t[1])[:10],
        "per_query": per_query,
    }
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")
    slim = {k: v for k, v in report.items() if k != "per_query"}
    print(json.dumps(slim, indent=1))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare(sys.argv[2:])
        return
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
