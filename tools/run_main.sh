#!/usr/bin/env bash
# Run a graft main via plain `java` against the packaged jar, so long
# bench/verify runs don't hold the sbt project lock (the driver's own
# entry point stays `sbt "runMain ..."` — this script only mirrors its
# JVM flags for local iteration). Usage:
#   tools/run_main.sh [-mem 8g] <mainClass> [args...]
# Env passthrough: SPARK_GRAFT_* as usual.
set -euo pipefail
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-8g}"
if [[ "${1:-}" == "-mem" ]]; then MEM="$2"; shift 2; fi
MAIN="$1"; shift
JAR=target/scala-2.13/breweriesetlspark_2.13-0.1.0.jar
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
FLAGS+=(--add-opens "java.base/sun.nio.ch=ALL-UNNAMED" \
  --add-opens "java.base/sun.nio.cs=ALL-UNNAMED" \
  --add-opens "java.base/sun.security.action=ALL-UNNAMED" \
  --add-opens "java.base/sun.util.calendar=ALL-UNNAMED")
exec java "-Xmx$MEM" "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_GCLOG:-} \
  -cp "$JAR:/opt/spark/jars/*" "$MAIN" "$@"
