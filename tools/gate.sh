#!/usr/bin/env bash
# Round-close correctness gate.
#
# The r9 receipts/driver discrepancy (builder claimed 269/269, driver
# recorded 268/269) came from per-family re-runs: a query that is green
# in isolation can still go red in the FULL single-JVM catalog run the
# driver performs (shared /tmp scratch, cache interleaving, catalog-order
# effects). Round-close receipts therefore MUST come from this script and
# nothing else:
#   * one JVM, the complete SparkEntry.queries catalog, driver order
#     (Verify with exactly two args — no per-query filtering),
#   * the driver's own comparator (tools/check.py) over ALL entries,
#   * the report committed verbatim as RECEIPTS.md,
#   * the per-entry row-hash manifest rollup committed as
#     RECEIPTS_MANIFEST.json — a later driver red diffs its outDir
#     manifest against this file to name the exact differing rows
#     (or prove the Spark outputs matched and the red is oracle-side).
#
# Usage: tools/gate.sh [sfDir] [outDir]
set -uo pipefail
SF_DIR=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_gate_out}
cd "$(dirname "$0")/.."

rm -rf "$OUT"
# /tmp hygiene receipt (r12 verdict task 6): Scratch.sweep is spec-pinned
# but nothing proved a full run ENDS clean — snapshot /tmp before, diff
# after, and commit the delta (cross-run caches are the one legitimate
# residue: the z8 audit layouts, rebuilt only when absent)
TMP_BEFORE_N=$(find /tmp -mindepth 1 -maxdepth 1 | wc -l)
TMP_BEFORE_B=$(du -sb /tmp 2>/dev/null | cut -f1)
find /tmp -mindepth 1 -maxdepth 1 | sort > /tmp/.graft_gate_tmp_before
echo "== gate: full catalog Verify @ $SF_DIR (single JVM, driver order)"
sbt -batch "runMain graft.Verify $SF_DIR $OUT" 2>&1 | tail -3
VERIFY_RC=${PIPESTATUS[0]}
if [ "$VERIFY_RC" -ne 0 ]; then
  # a Verify crash partway through must NOT produce a receipt: the
  # comparator over partial outputs is exactly the receipts/driver
  # discrepancy class this script exists to prevent (advisor finding)
  echo "== gate: Verify exited $VERIFY_RC — ABORTING, no receipt written"
  exit "$VERIFY_RC"
fi
echo "== gate: driver comparator over ALL entries"
REPORT=$(python3 tools/check.py "$SF_DIR" "$OUT")
RC=$?
SUMMARY=$(echo "$REPORT" | tail -1)
# /tmp delta AFTER the Verify JVM exited (its shutdown-hook sweep ran);
# the outDir itself and anything under it are the gate's own product
TMP_AFTER_N=$(find /tmp -mindepth 1 -maxdepth 1 | wc -l)
TMP_AFTER_B=$(du -sb /tmp 2>/dev/null | cut -f1)
TMP_NEW=$(find /tmp -mindepth 1 -maxdepth 1 | sort | comm -13 /tmp/.graft_gate_tmp_before - \
  | grep -v -e "^$OUT\$" -e '^/tmp/.graft_gate_tmp_before$' || true)
rm -f /tmp/.graft_gate_tmp_before
{
  echo "# RECEIPTS — round-close gate output (committed verbatim)"
  echo
  echo "- command: \`tools/gate.sh $SF_DIR $OUT\`"
  echo "- date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "- git: $(git rev-parse --short HEAD) ($(git status --porcelain | wc -l) dirty files)"
  echo "- catalog entries: $(find "$OUT" -maxdepth 1 -type d ! -path "$OUT" | wc -l)"
  echo "- result: $SUMMARY (exit $RC)"
  echo
  echo '```'
  echo "$REPORT" | grep -v '^OK ' || true
  echo '```'
  echo
  echo "## /tmp hygiene (r12 verdict task 6)"
  echo
  echo "- top-level entries: $TMP_BEFORE_N before, $TMP_AFTER_N after (excl. gate outDir)"
  echo "- bytes: $TMP_BEFORE_B before, $TMP_AFTER_B after"
  if [ -n "$TMP_NEW" ]; then
    echo "- new top-level /tmp entries surviving the run (cross-run caches are the"
    echo "  one legitimate class — z8 audit layouts, rebuilt only when absent):"
    echo "$TMP_NEW" | sed 's/^/  - /'
  else
    echo "- new top-level /tmp entries surviving the run: NONE"
  fi
} > RECEIPTS.md
# commit the builder-side spark row-hash rollup for cross-environment
# forensics (driver outDir manifest vs this file names differing rows)
[ -f "$OUT/manifest.json" ] && python3 -m json.tool "$OUT/manifest.json" > RECEIPTS_MANIFEST.json
# oracle-parallelism axis (r11 verdict task 4): the comparator itself
# re-run single-threaded — a DuckDB scheduling-order dependence must
# not masquerade as an engine red in a foreign environment
if [ "$RC" -eq 0 ]; then
  echo "== gate: comparator re-run under duckdb threads=1"
  # keep the FULL report (advisor r12): on divergence the per-entry FAIL
  # lines naming which queries differed are the whole point of the axis
  T1REPORT=$(GRAFT_DUCKDB_THREADS=1 python3 tools/check.py "$SF_DIR" "$OUT")
  T1RC=$?
  T1=$(echo "$T1REPORT" | tail -1)
  echo "- threads=1 comparator: $T1 (exit $T1RC)" >> RECEIPTS.md
  if [ "$T1RC" -ne 0 ]; then
    echo "== gate: threads=1 comparator DIVERGED: $T1"
    {
      echo
      echo "### threads=1 divergence detail"
      echo '```'
      echo "$T1REPORT" | grep -v '^OK ' || true
      echo '```'
    } >> RECEIPTS.md
    RC=$T1RC
  fi
fi
# /tables workspace e2e (r14 verdict task 4): the inline-JS pivot page
# driven for real (node + DOM shim against a live TablesDemo gateway)
# at EVERY round close — the advisor-r13 apply-reset bug class only
# surfaces here, and this step used to run only when someone
# remembered. Verdict committed into the receipt; a FAIL reds the gate.
echo "== gate: /tables workspace e2e (tools/tables_e2e.sh)"
E2E_OUT=$(tools/tables_e2e.sh 2>&1)
E2E_RC=$?
{
  echo
  echo "## /tables workspace e2e (r14 verdict task 4)"
  echo
  echo "- command: \`tools/tables_e2e.sh\` (exit $E2E_RC)"
  echo '```'
  echo "$E2E_OUT" | tail -8
  echo '```'
} >> RECEIPTS.md
if [ "$E2E_RC" -ne 0 ]; then
  echo "== gate: /tables e2e FAILED (exit $E2E_RC)"
  RC=$E2E_RC
fi
echo "$SUMMARY (exit $RC) — receipt written to RECEIPTS.md"
exit $RC
