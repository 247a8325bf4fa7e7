#!/bin/bash
# Usage: tools/debug_one.sh <file-substring:line> [altQuery]
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens=$p=ALL-UNNAMED"; done
DIR=/tmp/debugone
mkdir -p "$DIR"; cd "$DIR"
exec java $FLAGS -Xmx8g -Dfile.encoding=UTF-8 -Dspark.ui.enabled=false \
  -cp "$CP" graft.DebugOne /root/repo/tools/refparity_corpus.jsonl "$@" 2>/tmp/debugone_log.txt
