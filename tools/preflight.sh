#!/usr/bin/env bash
# End-of-sitting pre-flight: the exact sequence every round should be
# green on before the driver snapshots the repo.
#
#   bash tools/preflight.sh            # full: sweeps + pytest + bench
#   bash tools/preflight.sh --quick    # sweeps only (~12 min)
#
# Exits non-zero on the first red step.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 oracle sweep (engine session) =="
python tools/verify_local.py 2>/dev/null | tail -2

echo "== 2/4 oracle sweep (driver-shaped vanilla session, non-UTC) =="
TZ=America/New_York python tools/verify_vanilla.py 2>/dev/null | tail -2

if [[ "${1:-}" == "--quick" ]]; then
  echo "quick mode: skipping pytest + bench"
  exit 0
fi

echo "== 3/4 full pytest =="
python -m pytest tests/ -q 2>&1 | tail -2

echo "== 4/4 bench (sf0.1) + regression compare =="
python bench.py 2>/dev/null | tail -1 > /tmp/preflight_bench.json
python tools/bench_compare.py BENCH_idle_reference.json /tmp/preflight_bench.json | tail -3
echo "preflight green"
