#!/usr/bin/env bash
# Package logparser_spark and run the pipeline via spark-submit --py-files.
# Usage: ./scripts/submit.sh [--master local[8]] --input DIR --out DIR [job args...]
#        (--master must be the FIRST argument if given; remaining args go to run_job.py)
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[*]"
if [[ "${1:-}" == "--master" ]]; then MASTER="$2"; shift 2; fi

TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT
ZIP="$TMP/logparser_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" logparser_spark -x "*__pycache__*")

spark-submit \
  --master "$MASTER" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=64 \
  --py-files "$ZIP" \
  "$REPO/scripts/run_job.py" "$@"
