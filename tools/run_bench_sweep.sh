#!/bin/bash
# Round-3 bench sweep: every run SERIALIZED on a quiet machine (concurrent
# CPU load skews the tunneled-TPU numbers 2-3x; round-2 memory). Writes
# one-line JSONs under $1 (default /tmp/bench_r3) for tools/publish_bench.py.
set -u
DIR="${1:-/tmp/bench_r3}"
mkdir -p "$DIR"
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S))" >&2
  timeout 2400 env "$@" python bench.py 2>"$DIR/$name.err" | tail -1 > "$DIR/$name.json"
  if [ ! -s "$DIR/$name.json" ]; then
    echo "--- $name FAILED; retrying once" >&2
    timeout 2400 env "$@" python bench.py 2>>"$DIR/$name.err" | tail -1 > "$DIR/$name.json"
  fi
  cat "$DIR/$name.json" >&2
}

run headline           BENCH_DUMMY=1
run headline_int8all   BENCH_QUANT=int8-all
run headline_phases    BENCH_PHASES=1
run headline_2s_int8all BENCH_QUANT=int8-all BENCH_CHUNK=2.0
run headline_beam5     BENCH_BEAM=5 BENCH_RUNS=1
run scenario1          BENCH_SCENARIO=1
run scenario2          BENCH_SCENARIO=2
run scenario3          BENCH_SCENARIO=3
run scenario4          BENCH_SCENARIO=4
run scenario5          BENCH_SCENARIO=5
run scenario3_phases   BENCH_SCENARIO=3 BENCH_PHASES=1
run scenario4_phases   BENCH_SCENARIO=4 BENCH_PHASES=1
run streams16          BENCH_STREAMS=16
echo "sweep complete: $DIR" >&2
