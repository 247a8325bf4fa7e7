#!/bin/bash
# Like refparity_run.sh but runs from a CLASSES SNAPSHOT so recompiles
# in /root/repo don't disturb a sweep in flight.
# Usage: tools/refparity_snap.sh <snapdir> <shard_idx> <shard_cnt> [filter] [tag]
set -e
SNAP=$1; I=${2:-0}; N=${3:-1}; FILTER=${4:-}; TAG=${5:-$I}
CP="$SNAP:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens=$p=ALL-UNNAMED"; done
DIR=/tmp/refparity_shard_$TAG
rm -rf "$DIR"; mkdir -p "$DIR"
cd "$DIR"
exec java $FLAGS -Xmx8g -Dfile.encoding=UTF-8 -Dspark.ui.enabled=false \
  -cp "$CP" graft.RefParity /root/repo/tools/refparity_corpus.jsonl \
  /tmp/refparity_report_$TAG.jsonl "$I/$N" $FILTER \
  2> /tmp/refparity_log_$TAG.txt
