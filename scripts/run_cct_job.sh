#!/usr/bin/env bash
# cct-style batch transform under spark-submit --py-files
# (src/apps/cct.cpp as a cluster job; see jobs/cct_job.py).
#
# Usage: scripts/run_cct_job.sh <in.parquet> <out_dir> <projstr> [direction] [master]
set -euo pipefail
cd "$(dirname "$0")/.."

IN="${1:?input parquet path}"
OUT="${2:?output dir}"
PROJSTR="${3:?proj-string}"
DIRECTION="${4:-fwd}"
MASTER="${5:-local[8]}"

ZIP=/tmp/proj_4_spark.zip
rm -f "$ZIP"
python - <<EOF
import zipfile, pathlib
z = zipfile.ZipFile("$ZIP", "w")
for p in pathlib.Path("proj_4_spark").rglob("*.py"):
    z.write(p, p.as_posix())
z.close()
print("packaged", "$ZIP")
EOF

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  proj_4_spark/jobs/cct_job.py \
  --in "$IN" --out "$OUT" --projstr "$PROJSTR" --direction "$DIRECTION"
