#!/usr/bin/env bash
# Launch a graft main class in a BARE java JVM against the packaged jar
# (`sbt -batch package` first) + the image's Spark jars. The probe
# scripts use this instead of `sbt runMain` because concurrent sbt
# launches in one project dir race on sbt's boot-server Unix socket
# ("Address already in use" killed a race leg at boot), and because a
# probe that launches many short-lived JVMs should not pay ~15 s of sbt
# startup per JVM. Flags mirror build.sbt's fork options (Spark 4.x on
# JDK 17 needs the add-opens when SparkSession is created outside
# spark-submit; UTC + no UI match every other graft JVM).
#
#   tools/graft_java.sh graft.Verify /root/testdata/sf0.01 /tmp/out q50
#
# Env passes through unchanged (SPARK_GRAFT_WAREHOUSE, _MASTER, _CPUS,
# _HDFS_SIM, _LEASE_STALE_MS, SPARK_DRIVER_MEM...).
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
# `|| true` inside the substitution: under `set -euo pipefail` an
# unmatched glob fails `ls`, which would kill the script BEFORE the
# missing-jar diagnostic below could print
# exclude the -tests jar: a stray `Test/runMain`/`Test/package` leaves
# connorfunstreamproducerspark_*-tests.jar, which sorts BEFORE the main
# jar ('-' < '.') and carries no main classes — the glob must never
# pick it (found when a race script's every JVM died ClassNotFound)
JAR=$(ls "$REPO"/target/scala-2.13/connorfunstreamproducerspark_*.jar 2>/dev/null | grep -v -- '-tests\.jar$' | head -1 || true)
if [[ -z "$JAR" ]]; then
  echo "graft_java.sh: no packaged jar — run 'sbt -batch package' first" >&2
  exit 1
fi
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -cp "$JAR:/opt/spark/jars/*" "$@"
