#!/usr/bin/env bash
# /tables pivot-workspace e2e, machine-gated (r14 verdict task 4).
#
# The advisor-r13 apply-reset bug was exactly the class this shim
# catches (tools/drive_table_page.js RUNS the page's inline JS under a
# DOM shim against a LIVE gateway), but it only ran when someone
# remembered. tools/gate.sh now runs this script at every round close
# and commits its verdict line into RECEIPTS.md.
#
# Boots graft.tools.TablesDemo on a bare JVM (build.sbt's JDK-17
# add-opens replicated — Kryo/Spark need them outside sbt), extracts
# the inline <script> from the served page, drives it with node, and
# tears the demo down. Prints the shim's TABLE_PAGE_DRIVE_OK line on
# success; exits nonzero on any failure.
set -uo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ]; then
  echo "FAIL: $CLASSES missing — run sbt compile first"
  exit 1
fi
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done

LOG=$(mktemp /tmp/graft_tables_demo.XXXXXX.log)
# shellcheck disable=SC2086
java $OPENS -Xmx4g -Dspark.ui.enabled=false \
  -cp "$CLASSES:/opt/spark/jars/*" graft.tools.TablesDemo > "$LOG" 2>&1 &
PID=$!
trap 'kill "$PID" 2>/dev/null; wait "$PID" 2>/dev/null' EXIT

PORT=""
for _ in $(seq 1 120); do
  PORT=$(sed -n 's/^TABLES_DEMO_PORT=\([0-9]*\)$/\1/p' "$LOG" | head -1)
  [ -n "$PORT" ] && break
  kill -0 "$PID" 2>/dev/null || { echo "FAIL: demo JVM died"; tail -5 "$LOG"; exit 1; }
  sleep 1
done
if [ -z "$PORT" ]; then
  echo "FAIL: TablesDemo did not print a port in 120s"
  tail -5 "$LOG"
  exit 1
fi

curl -s "http://127.0.0.1:$PORT/tables/trades_raw" -o /tmp/page.html
python3 - <<'EOF'
import re
html = open('/tmp/page.html').read()
m = re.search(r'<script>(.*)</script>', html, re.S)
assert m, "no inline <script> found in /tables page"
open('/tmp/table_page.js', 'w').write(m.group(1))
EOF

GRAFT_GW_PORT="$PORT" node tools/drive_table_page.js
