#!/bin/bash
# Fast runner: compile via sbt once, cache the runtime classpath, then run
# mains directly with java (sbt runMain adds ~2 min of JVM/sbt overhead per
# invocation). Usage: scripts/run.sh <mainClass> [args...]
# Rebuild classpath cache with: rm target/.cp
set -e
cd "$(dirname "$0")/.."
CP_FILE=target/.cp
sbt -batch compile > /tmp/sbt_compile.log 2>&1 || { tail -30 /tmp/sbt_compile.log; exit 1; }
if [ ! -f "$CP_FILE" ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | grep -E '^[^[].*classes' | tail -1 > "$CP_FILE"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$(cat "$CP_FILE")" "$MAIN" "$@"
