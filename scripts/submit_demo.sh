#!/usr/bin/env bash
# Package the engine and run the bench via spark-submit --py-files
# (north_rule deployment shape). Local master stands in for the cluster.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/awc_spark_pkg.zip
rm -f "$ZIP"
zip -qr "$ZIP" amazonwebcrawler_spark __spark_entry__.py

CPUS="${SPARK_GRAFT_CPUS:-8}"
exec spark-submit \
  --master "local[$CPUS]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="$((CPUS * 2))" \
  --conf spark.sql.adaptive.enabled=true \
  bench.py --crawl-only
