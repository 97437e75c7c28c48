#!/bin/bash
# Sequential chip measurement suite (the TPU tunnel supports ONE client at a
# time — never parallelize these).  Each step logs to /tmp/chip_<name>.log.
# Usage: bash benchmarks/run_chip_suite.sh [quick|full]
set -u
cd "$(dirname "$0")/.."
MODE="${1:-full}"

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
  rc=$?
  tail -5 "/tmp/chip_${name}.log"
  echo "--- $name rc=$rc"
}

# fast probe first: bail early if the tunnel is down
timeout 60 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL DOWN — aborting suite"; exit 1; }

run micro_flow    900 python benchmarks/micro_flow.py
run gmfa          1200 python benchmarks/bench_gmfa.py
run profile_nn    1200 python benchmarks/profile_gmfa_nn.py
if [ "$MODE" = full ]; then
  run bench        900 python bench.py
  run flow_batched 900 python benchmarks/bench_flow_batched.py
  run multistream  900 python benchmarks/bench_multistream.py
  run from_points  900 python benchmarks/bench_from_points.py
  run diag_scan    1200 python benchmarks/diag_scan_1080p.py
fi
echo "SUITE DONE"
