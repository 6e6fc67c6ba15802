#!/bin/sh
# Package guac_spark for spark-submit --py-files.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/guac_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/guac_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("guac_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/guac_spark.zip")
EOF
