#!/bin/sh
# Package the library for spark-submit --py-files (includes the
# committed LID/ARPA model resources).
set -e
cd "$(dirname "$0")/.."
rm -f ungoliant_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("ungoliant_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("ungoliant_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
print("wrote ungoliant_spark.zip")
EOF
