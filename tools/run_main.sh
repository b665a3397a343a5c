#!/bin/bash
# Run a graft main class directly on the compiled classes + /opt/spark
# jars, bypassing sbt (no build-server lock — lets a long corpus
# generation or sweep run while sbt iterates in another terminal).
# Usage: tools/run_main.sh <mainClass> [args...]
# Heap via SPARK_DRIVER_MEM (default 8g), matching build.sbt.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# GRAFT_CLASSES overrides the classes dir — long sweeps snapshot the
# compiled classes so concurrent sbt iteration can't swap them mid-run.
CP="${GRAFT_CLASSES:-$REPO/target/scala-2.13/classes}:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS ${JVM_EXTRA:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Djava.awt.headless=true \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
