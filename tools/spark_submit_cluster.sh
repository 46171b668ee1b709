#!/usr/bin/env bash
# Run the index build + a BM25 query via spark-submit on a REAL
# multi-executor cluster (local-cluster mode: separate executor JVMs)
# at two cluster sizes — the sandbox form of the north rule's
# "spark-submit at N and 4N executors".
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
JAR=target/scala-2.13/jesterjspark_2.13-0.1.0.jar
CORPUS=${1:-/tmp/graft_bench_corpus/c960000}
export SPARK_SCALA_VERSION=2.13
for E in 2 8; do
  OUT=/tmp/graft_submit_$E
  rm -rf "$OUT"
  /opt/spark/bin/spark-submit \
    --master "local-cluster[$E,4,9216]" \
    --class graft.Main \
    --driver-memory 4g \
    --conf spark.executor.memory=8g \
    --conf spark.sql.shuffle.partitions=$((E*4)) \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.ui.enabled=false \
    "$JAR" build "$OUT" "corpus=$CORPUS" 2>/dev/null | grep '^built' | sed "s/^/executors=$E /"
done
/opt/spark/bin/spark-submit \
  --master "local-cluster[2,4,6144]" --class graft.Main \
  --driver-memory 4g --conf spark.executor.memory=4g \
  --conf spark.ui.enabled=false \
  "$JAR" query /tmp/graft_submit_8 user assistant tool 2>/dev/null | head -5
