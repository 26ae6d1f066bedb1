#!/usr/bin/env bash
# Local mirror of .github/workflows/ci.yml for offline environments.
# Runs: syntax gate, native build, full test suite on a virtual 8-device
# CPU mesh, fuzz smoke, multichip dryrun, and lint when ruff is present.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

echo "== syntax gate =="
python -m compileall -q tekken_tpu tools tests examples bench.py \
    __graft_entry__.py

echo "== native engine build =="
python -m tekken_tpu.native.build

echo "== tests (CPU, 8 virtual devices) =="
python -m pytest tests/ -q

echo "== fuzz smoke =="
python tools/fuzz_all_engines.py 5
python tools/fuzz_pretokenize.py --smoke

echo "== examples (executed, not just compiled) =="
for ex in examples/*.py; do
  echo "-- $ex"
  python "$ex" >/dev/null
done

echo "== multichip dryrun =="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

if command -v ruff >/dev/null 2>&1; then
  echo "== lint =="
  ruff check tekken_tpu tools tests examples bench.py
else
  echo "== lint skipped (ruff not installed in this image) =="
fi

echo "CI-LOCAL OK"
