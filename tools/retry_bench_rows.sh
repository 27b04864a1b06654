#!/bin/bash
# Retry round-3b rows that failed on axon relay outages (UNAVAILABLE /
# wedged backend init). Probes the relay with a tiny matmul before each
# attempt so a dead tunnel costs 2 min, not a 40-min wedged bench run.
# Rows whose $DIR/$name.json is already non-empty are skipped, so this is
# idempotent and safe to re-run until the sweep dir is complete.
set -u
DIR="${1:-/tmp/bench_r3}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
EOF
}

run_row() {
  local name="$1"; shift
  if [ -s "$DIR/$name.json" ]; then
    echo "=== $name already done; skipping" >&2
    return 0
  fi
  for attempt in 1 2 3; do
    echo "=== $name attempt $attempt ($(date +%H:%M:%S))" >&2
    if ! probe; then
      echo "--- relay probe failed; sleeping 300 s" >&2
      sleep 300
      continue
    fi
    timeout 2400 env "$@" python bench.py 2>>"$DIR/$name.err" | tail -1 > "$DIR/$name.json"
    if [ -s "$DIR/$name.json" ]; then
      cat "$DIR/$name.json" >&2
      return 0
    fi
    echo "--- $name attempt $attempt produced no JSON" >&2
  done
  return 1
}

# every round-3 streams row ran with a broken counter reset (bench.py replaced
# asr.counters, the upload path KeyError'd, serving swallowed it — the timed
# pass decoded ZERO ticks); all must re-run with the fixed in-place reset,
# which now also hard-fails on ticks==0 instead of publishing garbage.
run_row streams2           BENCH_STREAMS=2
run_row streams4           BENCH_STREAMS=4
run_row streams4_mixedlang BENCH_STREAMS=4 BENCH_STREAM_LANGS=en,zh
run_row streams8           BENCH_STREAMS=8
run_row streams16          BENCH_STREAMS=16
run_row streams16_int8all  BENCH_STREAMS=16 BENCH_QUANT=int8-all
run_row streams16_int8kv   BENCH_STREAMS=16 BENCH_QUANT=int8-kv
run_row headline_int8all_prequant BENCH_QUANT=int8-all BENCH_CHECKPOINT=/tmp/prequant_lv3
echo "retry pass complete: $DIR" >&2
