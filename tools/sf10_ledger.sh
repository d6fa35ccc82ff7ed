#!/usr/bin/env bash
# sf10 spot-promotion ledger (r12 verdict task 3): run the most
# scale-shape-sensitive catalog entries at a 100× replication of sf0.1
# (/tmp/graft_sf10, built by `ScaleSmoke gen-sf10`) through the SAME
# Verify + DuckDB comparator as the driver gate, with DuckDB memory and
# spill pinned and the bounded-error spec active (tools/sf_tolerances.json
# — the estimator rows carry their published-bound gates, everything
# else compares exactly).
#
# Usage: tools/sf10_ledger.sh [outDir]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=/tmp/graft_sf10
OUT=${1:-/tmp/verify_sf10}

# the sf10 promotion set: plans that change SHAPE with scale —
# adaptive LSH direct/factored branches (d3/d13), the winnow pair
# enumerator (d19), the salted join (j6), the funnel skew guard (a14),
# bounded graph iteration (g6/g8), footer-stats layout audits (z5/z8),
# and the SCD2 history window (a19)
ROWS="d3_minhash_lsh d3b_minhash_stats d13_minhash_dedup d19_winnow_pairs \
j6_salted_join a14_funnel g6_kcore g8_modularity z5_partition_skew \
z8_zorder_skipping a19_state_history"

if [ ! -f "$SF/_DONE" ]; then
  echo "== sf10: materializing 100x replication (one-time)"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.ScaleSmoke gen-sf10" | tail -2
fi

echo "== sf10: Verify over the promotion set"
# shellcheck disable=SC2086
SPARK_GRAFT_CPUS=32 GRAFT_SKIP_MANIFEST=1 \
  sbt -batch "runMain graft.Verify $SF $OUT $ROWS" 2>&1 | tail -3
RC=${PIPESTATUS[0]}
[ "$RC" -ne 0 ] && { echo "Verify failed rc=$RC"; exit $RC; }

echo "== sf10: DuckDB comparator (80GB cap, /tmp spill, bounded-error spec)"
mkdir -p /tmp/duck_spill
# shellcheck disable=SC2086
GRAFT_DUCKDB_MEM=80GB GRAFT_DUCKDB_TMP=/tmp/duck_spill \
GRAFT_TOLERANCE_SPEC=tools/sf_tolerances.json \
  python3 tools/check.py "$SF" "$OUT" $ROWS
