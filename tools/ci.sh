#!/bin/sh
# Full local verification, one command:
#   sh tools/ci.sh          # tests + oracle at sf0.01 + bench
#   sh tools/ci.sh quick    # tests only
set -e
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

if [ "$1" = "quick" ]; then exit 0; fi

echo "== duckdb oracle (sf0.01) =="
python tools/check_oracle.py

echo "== duckdb oracle (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/check_oracle.py

echo "== bench (sf0.1) =="
python bench.py

echo "== scale ratios (sf0.1 x2) =="
python tools/scale_check.py
