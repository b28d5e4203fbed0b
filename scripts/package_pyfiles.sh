#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (BASELINE.json
# north_rule: "run via spark-submit --py-files on a multi-executor cluster").
#
#   ./scripts/package_pyfiles.sh
#   spark-submit --py-files dist/gduns_name_match_spark.zip \
#       --conf spark.sql.adaptive.enabled=true ... your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gduns_name_match_spark.zip
python -m zipfile -c dist/gduns_name_match_spark.zip gduns_name_match_spark
echo "wrote dist/gduns_name_match_spark.zip"
