#!/bin/bash
# Compile and run graft.Bench against an sf dir (default sf0.1) — the
# local replica of the driver's per-round benchmark. Prints the one-line
# JSON and also writes it to $SPARK_GRAFT_BENCH_OUT (default
# bench_out.json). Usage: tools/run_bench.sh [sfDir] [cpus]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
CPUS=${2:-16}
# Pre-flight contention check (r10 forensics: a test suite or verify pass
# sharing the box read q65 at 17x with every neighbor within 1.4x and the
# whole-registry guard under its trigger — per-query damage the guard
# cannot see). Sampled BEFORE sbt compile (r10 review: sampling after the
# compile attributed the bench tooling's own load residue to pre-existing
# contention — the exact taint class this check separates). Warn loudly;
# Bench also records its own JVM-start load as load_avg_start.
LOAD1=$(cut -d' ' -f1 /proc/loadavg 2>/dev/null || echo -1)
if python3 -c "import sys; sys.exit(0 if float('$LOAD1') > 2.0 else 1)" 2>/dev/null; then
  echo "[bench-guard] WARNING: 1-min load $LOAD1 BEFORE the bench starts —" \
       "many-tiny-jobs queries (q65 signature) amplify concurrent work ~10x;" \
       "prefer a quiet box or expect a tainted record" 1>&2
fi
# Guard selftest BEFORE the expensive bench (r10 review: after it, a
# broken guard aborts post-hoc under set -e, leaving a freshly written
# sidecar on disk that was never checked).
python3 tools/bench_guard.py selftest
sbt -batch compile 1>&2
. tools/java_env.sh
OUT="${SPARK_GRAFT_BENCH_OUT:-bench_out.json}"
run_once() {
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_OUT="$OUT" \
    java $OPENS -Xmx16g -Dspark.ui.enabled=false -cp "$CP" graft.Bench
}
run_once
# Sidecar sanity guard (VERDICT r8 item 3): if the shared-query total is
# >1.5x off the cleanest committed anchor in either direction, re-run
# once and keep the cleaner (smaller) reading — local[32] contention only
# ever inflates; the kept file records that the guard fired. Every line
# also carries load_avg/cpus from graft.Bench itself.
if ! python3 tools/bench_guard.py check "$OUT"; then
  echo "[bench-guard] re-running once to separate contention from regression" 1>&2
  mv "$OUT" "$OUT.first"
  run_once
  python3 tools/bench_guard.py pick "$OUT" "$OUT" "$OUT.first"
  rm -f "$OUT.first"
  # REFUSE to leave a sidecar the guard still flags (r15, VERDICT r14
  # wrong #2: a contended capture was committed with only a footnote in
  # the record). The flagged reading is preserved for forensics under
  # .flagged, but the canonical sidecar path must only ever hold
  # guard-clean numbers — re-run on a quiet box instead.
  if ! python3 tools/bench_guard.py check "$OUT"; then
    mv "$OUT" "$OUT.flagged"
    echo "[bench-guard] REFUSING to keep a guard-flagged sidecar after the" \
         "re-run: saved as $OUT.flagged; fix the contention (quiet box," \
         "load_avg < 1) and run again" 1>&2
    exit 1
  fi
fi
