#!/usr/bin/env bash
# Run graft.ScaleProbe via plain java on a FROZEN classpath
# (SPARK_GRAFT_FROZEN, default target/r17_frozen/classes) so a long face can run while sbt
# recompiles the live tree underneath it. Mirrors build.sbt's forked-run
# JVM options (add-opens set, UTC, no UI) + the probe chain's standard
# extras (tiny input splits, zstd, scratch spark.local.dir, the r15
# GC-mortality flags). Heap from SPARK_DRIVER_MEM (default 8g).
set -u
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCRATCH=${SPARK_GRAFT_SCRATCH:-/root/repo/target/scratch}
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.files.maxPartitionBytes=2097152 \
  -Dspark.sql.files.openCostInBytes=262144 \
  -Dspark.local.dir="$SCRATCH" \
  -Dspark.io.compression.codec=zstd \
  -Dspark.network.timeout=600s \
  -XX:+ExplicitGCInvokesConcurrent \
  -cp "${SPARK_GRAFT_FROZEN:-target/r17_frozen/classes}:/opt/spark/jars/*" \
  graft.ScaleProbe "$@"
