#!/bin/bash
# Full correctness verify: dump every SparkEntry query at sf0.01 and
# compare against the DuckDB oracle (mimics the driver's t2 gate).
#
#   tools/run_verify.sh [outDir] [querySubset]
#
# Fast path: compiles once via sbt, then runs graft.Verify with plain
# java -cp (avoids sbt's project lock + startup). Requires the Java-17
# --add-opens set for Spark 4.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/verify_out}"
SUBSET="$2"
sbt -batch compile 2>&1 | tail -2
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" java $OPENS \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/testdata/sf0.01 "$OUT" $SUBSET 2>&1 \
  | grep -E '\[verify\]' | tail -20
python3 tools/selfcheck.py /root/testdata/sf0.01 "$OUT" | tail -5
