#!/usr/bin/env bash
# Launch the bench pipeline via spark-submit --py-files (north-rule launch
# mode: the packaged engine ships to executors as one zip).
#
#   scripts/submit.sh [--cores N] [--sf-dir DIR] [--dual]
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/nyxus_spark_pkg.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/nyxus_spark_pkg.zip", "w") as z:
    for root, _, files in os.walk("nyxus_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged nyxus_spark ->", "/tmp/nyxus_spark_pkg.zip")
EOF

CORES="${SPARK_GRAFT_CPUS:-32}"
exec spark-submit \
  --master "local[${CORES}]" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  bench.py "$@"
