#!/bin/bash
# Direct-JVM Verify runner (no sbt lock): tools/run_verify.sh <sfDir> <outDir> [query...]
# Heap via SPARK_DRIVER_MEM (default 48g for big-SF sweeps), cpus via SPARK_GRAFT_CPUS.
set -e
SFDIR="$1"; OUTDIR="$2"; shift 2
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SFDIR" "$OUTDIR" "$@"
