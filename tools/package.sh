#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gpiv_spark.zip
python - << 'EOF'
import zipfile
from pathlib import Path

# *.py plus the C kernel sources (compiled lazily on each node) — NOT
# the .so (machine-built, md5-keyed) or the lock files.
with zipfile.ZipFile("dist/gpiv_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for pat in ("*.py", "*.c"):
        for p in sorted(Path("gpiv_spark").rglob(pat)):
            z.write(p, p.as_posix())
print("wrote dist/gpiv_spark.zip")
EOF
echo "submit example:"
echo "  spark-submit --master 'local[32]' --py-files dist/gpiv_spark.zip \\"
echo "      jobs/run_pipeline.py --docs 2000000 --points 120000 --checkpoint /tmp/gpiv_ckpt"
