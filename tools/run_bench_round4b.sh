#!/bin/bash
# Round-4b bench sweep: the software-pipelined tick loop (dispatch N,
# finalize N-1 — token-exact with the sync loop, test_pipelined_online_
# matches_sync). Rows:
#   - headline_pipelined: the new as-fast default (BENCH_PIPELINE defaults on)
#   - headline_sync: A/B control (the round-4a headline_int8all row)
#   - headline_beam5_pipe: beam=5 through the pipelined loop (VERDICT r3 #4)
#   - headline_paced_pipe: paced feed + pipeline (throughput mode under pacing)
#   - scenario3/5_pipe: BASELINE acceptance configs through the app with
#     RWA_PIPELINE=1 (VERDICT r3 #3)
# Idempotent like run_bench_round4.sh; publish with
#   python tools/publish_bench.py DIR --round 4
set -u
DIR="${1:-/tmp/bench_r4}"
mkdir -p "$DIR"
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
EOF
}

quiet() {
  for _ in $(seq 1 60); do
    read -r l _ < /proc/loadavg
    if awk -v l="$l" 'BEGIN{exit !(l < 0.6)}'; then return 0; fi
    echo "--- host busy (load $l); sleeping 60 s" >&2
    sleep 60
  done
  return 0
}

run() {
  local name="$1"; shift
  if [ -s "$DIR/$name.json" ]; then
    echo "=== $name already done; skipping" >&2
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt ($(date +%H:%M:%S))" >&2
    quiet
    if ! probe; then
      echo "--- relay probe failed; sleeping 120 s" >&2
      sleep 120
      continue
    fi
    timeout 2400 env "$@" python bench.py 2>"$DIR/$name.err" | tail -1 > "$DIR/$name.json"
    if [ -s "$DIR/$name.json" ]; then break; fi
    echo "--- $name produced no output (see $DIR/$name.err)" >&2
  done
  cat "$DIR/$name.json" >&2
}

# headline: the shipped default (async pipeline + forced device draft)
run headline                BENCH_QUANT=int8-all
# controls: sync ticks / exact pipeline (token-identical mode)
run headline_sync           BENCH_QUANT=int8-all BENCH_PIPELINE=0
run headline_exact          BENCH_QUANT=int8-all BENCH_PIPELINE=exact
# paced deployment feed: sync ticks (latency-optimal) + pipelined variant
run headline_paced          BENCH_QUANT=int8-all BENCH_PACED=1
run headline_paced_pipe     BENCH_QUANT=int8-all BENCH_PACED=1 BENCH_PIPELINE=async
# beam 5 through both tick modes (no device draft on the beam path)
run headline_beam5_pipe     BENCH_QUANT=int8-all BENCH_BEAM=5
run headline_beam5_sync     BENCH_QUANT=int8-all BENCH_BEAM=5 BENCH_PIPELINE=0
# BASELINE scenario configs through the app with the async pipeline
run scenario5_pipe          BENCH_SCENARIO=5 RWA_PIPELINE=async
run scenario3_pipe          BENCH_SCENARIO=3 RWA_PIPELINE=async
run scenario2_pipe          BENCH_SCENARIO=2 RWA_PIPELINE=async
run scenario4_pipe          BENCH_SCENARIO=4 RWA_PIPELINE=async
echo "sweep complete: $DIR" >&2
