#!/usr/bin/env bash
# Direct scalac for quick tool iteration while sbt holds the project lock.
# Compiles the given .scala files against the existing classes + Spark jars
# straight into target/scala-2.13/classes. sbt/zinc recompiles them cleanly
# on its next run; this is a measurement-workflow convenience only.
# Locates the Scala 2.13 compiler jars wherever the local cache keeps them.
set -euo pipefail
find_jar() {
  find "$HOME/.cache/coursier" /opt/spark/jars -name "$1" 2>/dev/null | sort | tail -1
}
SC=$(find_jar 'scala-compiler-2.13*.jar')
SL=$(find_jar 'scala-library-2.13*.jar')
SR=$(find_jar 'scala-reflect-2.13*.jar')
[ -n "$SC" ] && [ -n "$SL" ] && [ -n "$SR" ] || {
  echo "scala 2.13 compiler jars not found; use sbt compile" >&2; exit 1; }
exec java -Xmx2g -cp "$SC:$SL:$SR" scala.tools.nsc.Main \
  -classpath "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  -d /root/repo/target/scala-2.13/classes "$@"
