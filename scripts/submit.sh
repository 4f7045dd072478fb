#!/usr/bin/env bash
# Cluster submission (north rule: spark-submit --py-files at N and 4N executors).
#
#   scripts/submit.sh bench.py [args...]            # local fallback
#   MASTER=spark://host:7077 scripts/submit.sh bench.py --scaling
#
# Packages the library as a zip for executor-side Python imports; no install
# step needed on the workers.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=build/nifi_nlp_processor_spark.zip
mkdir -p build
rm -f "$ZIP"
zip -qr "$ZIP" nifi_nlp_processor_spark -x '*__pycache__*'

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$@"
