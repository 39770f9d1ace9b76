#!/bin/sh
# Build the spark-submit artifact: dist/sanskrit_ocr_spark.zip for --py-files.
# The zip is built at submit time and NOT committed (a committed artifact
# goes stale the moment source changes — ADVICE r01); run this immediately
# before spark-submit.
set -e
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/sanskrit_ocr_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/sanskrit_ocr_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("sanskrit_ocr_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/sanskrit_ocr_spark.zip")
EOF
