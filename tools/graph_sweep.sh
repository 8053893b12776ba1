#!/bin/bash
# One-query-per-JVM sweep with a disk watchdog: big-SF graph queries
# can spike tens of GB of LIVE shuffle (per-query GC only reclaims
# between queries), and a disk-full crash takes the whole JVM's
# remaining queries with it. Usage:
#   tools/graph_sweep.sh <sfDir> <outDir> <minFreeGB> q1 q2 ...
set -u
SFDIR="$1"; OUTDIR="$2"; MINFREE="$3"; shift 3
for q in "$@"; do
  echo "=== $q $(date +%H:%M:%S) free=$(df -BG --output=avail / | tail -1 | tr -d ' G')G"
  SPARK_GRAFT_VERIFY_GC=1 tools/run_verify.sh "$SFDIR" "$OUTDIR" "$q" &
  pid=$!
  while kill -0 $pid 2>/dev/null; do
    free=$(df -BG --output=avail / | tail -1 | tr -d ' G')
    if [ "$free" -lt "$MINFREE" ]; then
      echo "!!! disk watchdog: ${free}G free < ${MINFREE}G — killing $q"
      kill $pid; sleep 10; kill -9 $pid 2>/dev/null
      rm -rf "$OUTDIR/$q"
      break
    fi
    sleep 15
  done
  wait $pid 2>/dev/null
  echo "=== $q exit, free=$(df -BG --output=avail / | tail -1 | tr -d ' G')G"
done
