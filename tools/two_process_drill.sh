#!/bin/bash
# TRUE two-process commit rehearsal (VERDICT r13 task 6): two SEPARATE
# JVMs — plain `java`, no sbt, each its own SparkSession and in-memory
# catalog, nothing shared but the filesystem — ingest concurrently into
# one state log; a third process then checks dense unique gen_ids, every
# batch exactly once, zero claim residue, and final state == a scratch
# replay. Exercises StateLog.attach + the filesystem claim CAS for real.
#
# Usage: tools/two_process_drill.sh   (from anywhere; ~3-6 min)
# Requires: sbt compile already run (target/scala-2.13/classes present).
set -euo pipefail
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
JVM_OPTS=(
  -Xmx3g
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  -Djdk.reflect.useDirectMethodHandleAccessor=false
)
WORK=$(mktemp -d /tmp/graft_2proc.XXXXXX)
echo "[drill] workdir: $WORK"

run() { java "${JVM_OPTS[@]}" -cp "$CP" graft.TwoProcessDrill "$@"; }

run prep "$WORK"

# two REAL processes racing 4 batches each into the same log, plus a
# THIRD process checkpointing the manifest in a loop against them (the
# r13 checkpoint-under-live-committers rehearsal, cross-process)
run ingest "$WORK" 100 4 > "$WORK/ingest_a.log" 2>&1 &
PA=$!
run ingest "$WORK" 200 4 > "$WORK/ingest_b.log" 2>&1 &
PB=$!
run checkpoint "$WORK" 12 > "$WORK/checkpoint.log" 2>&1 &
PC=$!
FAIL=0
wait "$PA" || FAIL=1
wait "$PB" || FAIL=1
wait "$PC" || FAIL=1
grep '\[drill\]' "$WORK/ingest_a.log" "$WORK/ingest_b.log" "$WORK/checkpoint.log" || true
if [ "$FAIL" -ne 0 ]; then
  echo "[drill] FAIL: a drill process exited non-zero"; exit 1
fi

run check "$WORK" "100,101,102,103,200,201,202,203"
echo "[drill] PASS: two-process rehearsal green (workdir kept: $WORK)"
