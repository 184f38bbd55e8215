#!/bin/bash
# Compile, run graft.Verify on an sf dir, then tools/check.py against the
# DuckDB oracle — the local replica of the driver's t2 gate.
# Usage: tools/run_verify.sh [sfDir] [outDir]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
sbt -batch compile 1>&2
. tools/java_env.sh
rm -rf "$OUT"
java $OPENS -Xmx8g -Dspark.ui.enabled=false -cp "$CP" graft.Verify "$SF" "$OUT" 1>&2
python3 tools/check.py "$SF" "$OUT"
