#!/bin/bash
# spark-submit deployment (north_rule: --py-files packaging, multi-executor).
# Usage: scripts/submit.sh [job args...]   (env: SPARK_GRAFT_CPUS=32)
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-32}"
ZIP="$(mktemp -u /tmp/ocr_gang_spark_XXXX).zip"
(cd "$ROOT" && zip -qr "$ZIP" ocr_gang_spark -x '*__pycache__*')
export SPARK_SUBMIT_RUNNING=1
export OMP_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 MKL_NUM_THREADS=1
exec spark-submit \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \
  --conf spark.driver.memory="${SPARK_GRAFT_DRIVER_MEM:-32g}" \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$ROOT/jobs/extract_job.py" \
  --weights-mlp "$ROOT/fixtures/ocrwb.txt" \
  --weights-cnn "$ROOT/fixtures/cnnwb.txt" \
  "$@"
