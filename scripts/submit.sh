#!/usr/bin/env bash
# Launch the engine via spark-submit --py-files (the north rule's
# deployment shape). Builds the package zip, then submits.
#
#   scripts/submit.sh [master] [sf_dir] [query ...]
#
# e.g. scripts/submit.sh local[8] /root/testdata/sf0.001 pip_join knn
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
shift || true

ZIP=/tmp/geozero_spark_submit.zip
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" geozero_spark -x '*__pycache__*')

exec spark-submit --master "$MASTER" \
    --py-files "$ZIP" \
    "$REPO/scripts/submit_job.py" "$@"
