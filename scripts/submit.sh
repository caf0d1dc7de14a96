#!/usr/bin/env bash
# Launch the extraction pipeline via spark-submit --py-files (north
# rule launch mode). Builds the package zip, then submits; all args
# after the script name go to scripts/submit_extract.py.
#
#   MASTER=spark://host:7077 scripts/submit.sh --input /data/pages --store /data/out
#   scripts/submit.sh --input ... --store ...     # defaults to local[8]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PKG="$(python - <<PY
import shutil, tempfile, os
print(shutil.make_archive(
    os.path.join(tempfile.mkdtemp(prefix="nse_submit_"), "nse_spark_pkg"),
    "zip",
    root_dir="$REPO",
    base_dir="neurostore_text_extraction_spark",
))
PY
)"
exec spark-submit \
  --master "${MASTER:-local[8]}" \
  --py-files "$PKG" \
  "$REPO/scripts/submit_extract.py" "$@"
