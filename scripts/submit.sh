#!/usr/bin/env bash
# Package the engine and launch the dedup pipeline via spark-submit
# --py-files — the north rule's launch mode. On a real cluster only
# --master (and executor sizing) changes; the zip distribution path is
# identical.
#
# Usage: scripts/submit.sh [--master local[8]] [pipeline args...]
# Example:
#   scripts/submit.sh --master 'local[8]' \
#       --input synth:5000 --output /tmp/gd_submit_out --fresh --no-suffix
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
DIST="$REPO/dist"
ZIP="$DIST/hyrise_generalized_dedup_spark.zip"

mkdir -p "$DIST"
# REPO/ZIP reach the builder via the environment, NOT string
# interpolation into the heredoc — paths with quotes/spaces stay intact.
GD_REPO="$REPO" GD_ZIP="$ZIP" python3 - <<'EOF'
import os, zipfile
repo = os.environ["GD_REPO"]
zpath = os.environ["GD_ZIP"]
pkg = os.path.join(repo, "hyrise_generalized_dedup_spark")
with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))
print("built", zpath)
EOF

MASTER="local[8]"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

# ${ARGS[@]+...}: under set -u an empty array expansion errors on
# bash < 4.4, so guard the expansion.
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_pipeline.py" --master "$MASTER" ${ARGS[@]+"${ARGS[@]}"}
