#!/bin/bash
# Sequential chip measurement suite (the TPU tunnel supports ONE client at a
# time — never parallelize these).  Each step logs to /tmp/chip_<name>.log and
# appends its one-line JSON result (or an rc!=0 record) to the incremental
# snapshot file, so a mid-suite tunnel drop still leaves every completed
# measurement on disk (VERDICT r3 item 2).
# Usage: bash benchmarks/run_chip_suite.sh [quick|full] [snapshot.jsonl]
set -u
cd "$(dirname "$0")/.."
MODE="${1:-full}"
SNAP="${2:-/tmp/chip_suite_results.jsonl}"

run() {
  name="$1"; tmo="$2"; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
  rc=$?
  tail -5 "/tmp/chip_${name}.log"
  echo "--- $name rc=$rc"
  # snapshot: the last line that parses as JSON, else an rc record
  json=$(grep -E '^\{.*\}$' "/tmp/chip_${name}.log" | tail -1)
  if [ -n "$json" ]; then
    echo "{\"step\": \"$name\", \"rc\": $rc, \"result\": $json}" >> "$SNAP"
  else
    echo "{\"step\": \"$name\", \"rc\": $rc, \"result\": null}" >> "$SNAP"
  fi
}

# probe with retries: a transient tunnel outage should delay the suite, not
# abort it (each benchmark also retries its own backend init)
probe_ok=0
for attempt in 1 2 3 4 5 6 7 8; do
  if timeout 90 python -c "import jax; print(jax.devices())"; then
    probe_ok=1; break
  fi
  echo "tunnel probe failed (attempt $attempt/8); retrying in 120s"
  sleep 120
done
if [ "$probe_ok" = 0 ]; then
  echo "TUNNEL DOWN — aborting suite"
  echo '{"step": "probe", "rc": 1, "result": null}' >> "$SNAP"
  exit 1
fi

run micro_flow    900 python benchmarks/micro_flow.py
run gmfa          1200 python benchmarks/bench_gmfa.py
run profile_nn    1200 python benchmarks/profile_gmfa_nn.py
run icp_sound     1200 python benchmarks/diag_icp_sound.py
if [ "$MODE" = full ]; then
  run bench        900 python bench.py
  run flow_batched 900 python benchmarks/bench_flow_batched.py
  run multistream  900 python benchmarks/bench_multistream.py
  run from_points  1200 python benchmarks/bench_from_points.py
  run diag_scan    1200 python benchmarks/diag_scan_1080p.py
  run quality      2400 python benchmarks/bench_quality.py
  run diag_4k      1800 python benchmarks/diag_4k.py
fi
echo "SUITE DONE"
