#!/bin/bash
# Local bench runner: bare java, mirrors the driver's invocation.
#   tools/bench.sh <outFile> [query ...]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-bench_out.json}
shift 2>/dev/null || true
CP="$PWD/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# BENCH_XMX shrinks the heap for memory-pressure experiments (the
# r13/r14 first-touch RCA: a squeezed block store makes eviction
# churn measurable via rddWrites at flat jobs)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_OUT="$OUT" \
java -Xmx${BENCH_XMX:-16g} $OPENS -Dspark.ui.enabled=false \
  -cp "$CP" graft.Bench "$@" > /dev/null
