#!/usr/bin/env bash
# spark-submit --py-files launch wrapper (north_rule: "launched via
# spark-submit --py-files on multi-executor clusters").
#
#   scripts/submit.sh jobs/run_join.py --input-a ... --input-b ... \
#       --output ... --manifest ...
#
# On a real cluster drop --master (spark-submit picks it up from the
# cluster manager); in this sandbox it defaults to local[32].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="$1"; shift

ZIP="$(mktemp -d)/engine.zip"
(cd "$REPO" && python -c "
import zipfile, pathlib
z = zipfile.ZipFile('$ZIP', 'w')
for p in pathlib.Path('rtree_cpp_spark').rglob('*.py'):
    z.write(p, p)
for p in pathlib.Path('jobs').rglob('*.py'):
    z.write(p, p)
z.close()
")

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
    --master "$MASTER" \
    --py-files "$ZIP" \
    --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    "$REPO/$JOB" "$@"
