#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (BASELINE.json:14).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
# Pure-python package; tests/fixtures excluded.
find bdqc_spark -name '*.py' ! -path '*__pycache__*' | zip -q dist/engine.zip -@
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -3
