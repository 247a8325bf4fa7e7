#!/bin/bash
# Run graft.RefParity shard i/n in an isolated working dir (own
# spark-warehouse) via plain java — no sbt lock, so shards parallelize.
# Usage: tools/refparity_run.sh <shard_idx> <shard_cnt> [cpus] [filter]
set -e
I=${1:-0}; N=${2:-1}; CPUS=${3:-8}; FILTER=${4:-}
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens=$p=ALL-UNNAMED"; done
DIR=/tmp/refparity_shard_$I
rm -rf "$DIR"; mkdir -p "$DIR"
cd "$DIR"
exec java $FLAGS -Xmx8g -Dfile.encoding=UTF-8 -Dspark.ui.enabled=false \
  -cp "$CP" graft.RefParity /root/repo/tools/refparity_corpus.jsonl \
  /tmp/refparity_report_$I.jsonl "$I/$N" $FILTER \
  2> /tmp/refparity_log_$I.txt
