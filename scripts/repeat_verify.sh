#!/usr/bin/env bash
# Flake-reproduction harness: N fresh-JVM full-suite Verify dumps,
# canonical-hash compared per gate (graft.tools.RepeatVerify).
#   scripts/repeat_verify.sh <sfDir> <n> [gate,gate,...]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
N="${2:-5}"
GATES="${3:-}"
cd "$(dirname "$0")/.."

CP_FILE=target/graft_cp.txt
if [ ! -s "$CP_FILE" ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | grep '/opt/spark/jars' | tail -1 > "$CP_FILE"
fi
CP="$(cat "$CP_FILE")"
OUT="${REPEAT_OUT:-/tmp/graft_repeat_verify_$$}"
mkdir -p "$OUT"
echo "[repeat-verify] output base: $OUT"
GRAFT_CP="$CP" java -cp "$CP" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  graft.tools.RepeatVerify "$SF_DIR" "$OUT" "$N" ${GATES:+"$GATES"}
