#!/bin/bash
# Build the --py-files artifact for spark-submit deployment.
#   scripts/package.sh [dist-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
DIST="${1:-dist}"
mkdir -p "$DIST"
rm -f "$DIST/hades_spark.zip"
# package the library only (tests/tools stay out of the executors)
zip -qr "$DIST/hades_spark.zip" hades_spark -x "*__pycache__*"
echo "$DIST/hades_spark.zip"
