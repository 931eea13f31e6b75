#!/usr/bin/env bash
# spark-submit packaging path (north rule: `spark-submit --py-files`
# on a multi-executor cluster; in this sandbox master=local[N]).
#
# Usage: scripts/run_tiling_job.sh [master] [sf_dir] [out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local[8]}"
SF_DIR="${2:-/root/testdata/sf0.001}"
OUT_DIR="${3:-/tmp/tiling_out}"

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
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  proj_4_spark/jobs/tiling_job.py \
  --sf-dir "$SF_DIR" --out "$OUT_DIR"
