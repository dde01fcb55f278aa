#!/usr/bin/env bash
# Run a graft main class directly from the compiled sbt output, with the
# same JDK-17 --add-opens set build.sbt forks with — avoids the sbt build
# lock so probes/benches can run while a compile or test is in flight.
# Usage: scripts/run_main.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
FLAGS+=(--add-opens "java.base/sun.nio.ch=ALL-UNNAMED" \
  --add-opens "java.base/sun.nio.cs=ALL-UNNAMED" \
  --add-opens "java.base/sun.security.action=ALL-UNNAMED" \
  --add-opens "java.base/sun.util.calendar=ALL-UNNAMED")
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
