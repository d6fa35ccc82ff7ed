#!/usr/bin/env bash
# Driver-red forensics in ONE command (r11 verdict task 5).
#
# Background: rounds 9-11 each showed driver-side hash-reds that were
# green in the builder's gate. The r11 judge settled it by hand —
# locating the driver's own Verify outDir (/root/.graft/verify_out,
# written AFTER the final commit) and diffing its per-entry row-hash
# manifests against the committed RECEIPTS_MANIFEST.json: all entries
# bit-identical, therefore the red was oracle/comparator-side (uncast
# HUGEINT). This script is that procedure, automated:
#
#   1. locate the newest FOREIGN Verify outDir — a manifest.json not
#      under /tmp and not this repo's own gate output, with mtime
#      newer than the last commit (i.e. written by the driver after
#      the builder finished), unless an outDir is passed explicitly;
#   2. diff its rollup manifest against RECEIPTS_MANIFEST.json
#      entry-by-entry (rows / agg_sum / agg_xor);
#   3. print the verdict: "Spark-side identical => any driver red is
#      oracle/comparator-side" or the named differing entries (whose
#      per-entry <name>.manifest.json sorted-prefix diff names rows).
#
# Usage: tools/forensics.sh [driverOutDir]
set -uo pipefail
cd "$(dirname "$0")/.."

if [ ! -f RECEIPTS_MANIFEST.json ]; then
  echo "forensics: no committed RECEIPTS_MANIFEST.json — run tools/gate.sh first" >&2
  exit 2
fi

DRIVER_OUT=${1:-}
if [ -z "$DRIVER_OUT" ]; then
  LAST_COMMIT=$(git log -1 --format=%ct)
  # newest foreign manifest.json: outside /tmp (builder scratch), the
  # REPO TREE (excluded by the cwd we just cd'd into — not a hardcoded
  # path, review r12: a gate outDir placed under the repo or under
  # /root must never self-match and report a trivially green verdict),
  # and newer than the last commit (the driver runs after the builder)
  # candidates newest-first; the FIRST that passes the shape check wins.
  # Shape check (advisor r12): any unrelated tool writing a manifest.json
  # under /root could otherwise be picked and produce a confident but
  # wrong verdict — require the JSON to parse as a {name:{rows,agg_sum,
  # agg_xor}} rollup sharing >=50% of entry names with the committed
  # RECEIPTS_MANIFEST.json before trusting it.
  CANDIDATES=$(find /root -maxdepth 5 -name manifest.json \
      -not -path "$PWD/*" -not -path '/root/repo/*' -not -path '/tmp/*' 2>/dev/null \
    | while read -r m; do
        mt=$(stat -c %Y "$m" 2>/dev/null || echo 0)
        [ "$mt" -gt "$LAST_COMMIT" ] && echo "$mt $(dirname "$m")"
      done | sort -rn | cut -d' ' -f2-)
  DRIVER_OUT=""
  for c in $CANDIDATES; do
    if python3 - "$c/manifest.json" <<'SHAPE' >/dev/null 2>&1
import json, sys
cand = json.load(open(sys.argv[1]))
ours = json.load(open("RECEIPTS_MANIFEST.json"))
assert isinstance(cand, dict) and cand
assert all(isinstance(v, dict) and {"rows", "agg_sum", "agg_xor"} <= set(v)
           for v in cand.values())
assert len(set(cand) & set(ours)) * 2 >= len(ours)
SHAPE
    then DRIVER_OUT=$c; break
    else echo "forensics: skipping $c (manifest.json is not a Verify rollup sharing >=50% entry names)" >&2
    fi
  done
  if [ -z "$DRIVER_OUT" ]; then
    echo "forensics: no foreign Verify outDir newer than the last commit found" >&2
    echo "           (pass one explicitly: tools/forensics.sh <outDir>)" >&2
    exit 2
  fi
fi
echo "== forensics: diffing $DRIVER_OUT/manifest.json vs committed RECEIPTS_MANIFEST.json"

python3 - "$DRIVER_OUT" <<'PYEOF'
import json, sys, os
out = sys.argv[1]
theirs = json.load(open(os.path.join(out, "manifest.json")))
ours = json.load(open("RECEIPTS_MANIFEST.json"))
common = sorted(set(theirs) & set(ours))
only_ours = sorted(set(ours) - set(theirs))
only_theirs = sorted(set(theirs) - set(ours))
diff = [(k, ours[k], theirs[k]) for k in common if ours[k] != theirs[k]]
print(f"entries: committed={len(ours)} driver={len(theirs)} common={len(common)}")
if only_ours:
    print(f"  {len(only_ours)} committed entries absent from the driver outDir "
          f"(partial/crashed run?) e.g. {only_ours[:5]}")
if only_theirs:
    print(f"  {len(only_theirs)} driver entries not in the committed manifest "
          f"e.g. {only_theirs[:5]}")
if not diff:
    scope = "all common entries" if (only_ours or only_theirs) else "all entries"
    print(f"VERDICT: {scope} bit-identical — Spark-side outputs in the driver")
    print("         run ARE the committed gate outputs. Any driver red is")
    print("         ORACLE/COMPARATOR-side (check oracle output types: the")
    print("         r9-r11 class was uncast DuckDB HUGEINT -> decimal128;")
    print("         tools/check.py now lints for it).")
    sys.exit(0)
print(f"VERDICT: {len(diff)} entries differ SPARK-SIDE — engine/environment divergence:")
for k, a, b in diff:
    print(f"  {k}:")
    print(f"    committed: {a}")
    print(f"    driver   : {b}")
print("next: diff the per-entry sorted-hash prefixes to name rows, e.g.")
print(f"  python3 -m json.tool {out}/<name>.manifest.json  # vs the gate outDir twin")
print("then re-run that entry under tools/InvarianceSweep hostile configs.")
sys.exit(1)
PYEOF
