#!/bin/bash
# One-query-per-JVM sweep with a disk watchdog: big-SF graph queries
# can spike tens of GB of LIVE shuffle (per-query GC only reclaims
# between queries), and a disk-full crash takes the whole JVM's
# remaining queries with it. Usage:
#   tools/graph_sweep.sh <sfDir> <outDir> <minFreeGB> q1 q2 ...
set -u
SFDIR="$1"; OUTDIR="$2"; MINFREE="$3"; shift 3
mkdir -p "$OUTDIR"
# Watch the filesystems that actually receive writes (the output dir
# and the shuffle/tmp dir), not "/" — on a multi-fs host the root
# volume can sit healthy while the data disk fills, or vice versa.
TMPD="${TMPDIR:-/tmp}"
freeg() {
  local a b
  a=$(df -BG --output=avail "$OUTDIR" 2>/dev/null | tail -1 | tr -d ' G')
  b=$(df -BG --output=avail "$TMPD" 2>/dev/null | tail -1 | tr -d ' G')
  # Fail CLOSED: a df that errors or prints non-numeric output reads
  # as 0 free — the watchdog kills rather than running blind on a
  # disk it can't see (an empty $a would otherwise crash the -lt test
  # and silently fall back to the other volume's number).
  case "$a" in (''|*[!0-9]*) echo "freeg: unreadable df for $OUTDIR — treating as 0" >&2; a=0;; esac
  case "$b" in (''|*[!0-9]*) echo "freeg: unreadable df for $TMPD — treating as 0" >&2; b=0;; esac
  if [ "$a" -lt "$b" ]; then echo "$a"; else echo "$b"; fi
}
for q in "$@"; do
  echo "=== $q $(date +%H:%M:%S) free=$(freeg)G"
  SPARK_GRAFT_VERIFY_GC=1 tools/run_verify.sh "$SFDIR" "$OUTDIR" "$q" &
  pid=$!
  while kill -0 $pid 2>/dev/null; do
    free=$(freeg)
    if [ "$free" -lt "$MINFREE" ]; then
      echo "!!! disk watchdog: ${free}G free < ${MINFREE}G — killing $q"
      kill $pid; sleep 10; kill -9 $pid 2>/dev/null
      rm -rf "$OUTDIR/$q"
      break
    fi
    sleep 15
  done
  wait $pid 2>/dev/null
  echo "=== $q exit, free=$(freeg)G"
done
