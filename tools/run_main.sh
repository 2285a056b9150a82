#!/usr/bin/env bash
# Direct-java runner for graft mains: bypasses the sbt lock so measurement
# runs can proceed while sbt test holds the project. Classes must already
# be compiled (sbt compile). Usage: tools/run_main.sh <MainClass> [args...]
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=(java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
