#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p build
rm -f build/parquet_to_arrow_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("build/parquet_to_arrow_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("parquet_to_arrow_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote build/parquet_to_arrow_spark.zip")
EOF
