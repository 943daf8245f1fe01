#!/bin/bash
# Deployment-shape smoke test: the north-rule submit form
#   spark-submit --py-files lucene_spark.zip scripts/build_index_job.py
# against a generated corpus on a local master. Proves the package is
# self-contained under --py-files (no repo-cwd imports) and the job
# prints its one-line JSON manifest.
set -euo pipefail
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
rm -f .build/lucene_spark.zip
zip -qr .build/lucene_spark.zip lucene_spark
OUT=.build/submit_smoke
rm -rf "$OUT"
/opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-4}]" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.ui.enabled=false \
  --py-files .build/lucene_spark.zip \
  scripts/build_index_job.py --gen-docs 2000 --out "$OUT" \
  2>/dev/null | tail -1
test -f "$OUT/manifest.json" && echo "smoke OK: $OUT/manifest.json"
