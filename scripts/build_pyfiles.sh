#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (cluster deployment).
#
#   ./scripts/build_pyfiles.sh            # -> dist/unify_spark.zip
#   spark-submit --py-files dist/unify_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       your_job.py
#
# or run the CLI directly on a cluster:
#   spark-submit --py-files dist/unify_spark.zip -m unify_spark.cli validate ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/unify_spark.zip
zip -qr dist/unify_spark.zip unify_spark -x '*__pycache__*'
echo "dist/unify_spark.zip"
