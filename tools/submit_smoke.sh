#!/usr/bin/env bash
# Smoke-run the spark-submit entry point (graft.core.Sessions.submit —
# the one north-rule surface a local[
# ] session never exercises): package the compiled classes into an
# application jar and drive `graft.Cli trace` through a REAL
# spark-submit, with a local master standing in for the cluster
# manager (the session still comes from Sessions.submit's getOrCreate,
# master/memory from the submit command — exactly the deployment
# wiring).
#
# Usage: tools/submit_smoke.sh  (after `sbt -batch compile`)
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
SUBMIT=${SPARK_SUBMIT:-/opt/spark/bin/spark-submit}
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile"; exit 1; }
[ -x "$SUBMIT" ] || { echo "no spark-submit at $SUBMIT"; exit 2; }
JAR=$(mktemp /tmp/graft-submit-XXXXXX.jar)
jar cf "$JAR" -C "$CLASSES" .
OUT=$(mktemp -d /tmp/graft-submit-out-XXXXXX)
rm -rf "$OUT"
LOG=${1:-/tmp/graft-submit-smoke.log}
"$SUBMIT" \
  --master 'local[4]' \
  --driver-memory 4g \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --class graft.Cli \
  "$JAR" trace /root/testdata/sf0.001 "$OUT/trace" >"$LOG" 2>&1
grep -q "trace: wrote" "$LOG" || { echo "no trace summary in $LOG"; tail -20 "$LOG"; exit 3; }
# the written streams must round-trip through the replay parser
test -n "$(ls "$OUT/trace")" || { echo "trace dir empty"; exit 4; }
rm -f "$JAR"
echo "SUBMIT SMOKE OK: $(grep 'trace: wrote' "$LOG")"
