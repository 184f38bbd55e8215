#!/bin/bash
# Compile and run graft.Bench against an sf dir (default sf0.1) — the
# local replica of the driver's per-round benchmark. Prints the one-line
# JSON and also writes it to $SPARK_GRAFT_BENCH_OUT (default
# bench_out.json). Usage: tools/run_bench.sh [sfDir] [cpus]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
CPUS=${2:-16}
sbt -batch compile 1>&2
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  java $OPENS -Xmx16g -Dspark.ui.enabled=false -cp "$CP" graft.Bench
