#!/bin/sh
# Package the engine for spark-submit --py-files (north rule: "run via
# spark-submit --py-files on multi-executor clusters"). Produces
# dist/auto_archiver_spark.zip containing the package at the archive root,
# which executors unpack onto sys.path.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/auto_archiver_spark.zip
python3 - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/auto_archiver_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("auto_archiver_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/auto_archiver_spark.zip")
EOF
