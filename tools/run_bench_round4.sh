#!/bin/bash
# Round-4 bench sweep. Priority order:
#   A. headline + async-D2H A/B + paced diagnosis rows (VERDICT r3 #1)
#   B. scenario 3/5 + phase splits (VERDICT r3 #3), then the rest
#   C. full multi-stream capacity sweep 2/4/8/16/32 x {int8,int8-all,int8-kv}
#      on round-4 code with the ticks>0 guard (VERDICT r3 #2)
# Idempotent: rows with a non-empty $DIR/$name.json are skipped. Probes the
# relay before each row and waits for a quiet host (1-core; concurrent load
# skews numbers 2-3x). Publish with tools/publish_bench.py $DIR --round 4.
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

# --- A: headline + async-D2H A/B + paced diagnosis -------------------------
run headline_int8all       BENCH_QUANT=int8-all
run headline_noasync       BENCH_QUANT=int8-all RWA_NO_ASYNC_D2H=1
run headline_paced         BENCH_QUANT=int8-all BENCH_PACED=1
# paced-tax diagnosis: faster pings / upload-sized pings (cwnd decay, RFC 2861)
run headline_paced_ka100   BENCH_QUANT=int8-all BENCH_PACED=1 RWA_KEEPALIVE_MS=100
run headline_paced_ka32k   BENCH_QUANT=int8-all BENCH_PACED=1 RWA_KEEPALIVE_MS=100 RWA_KEEPALIVE_KB=32
run headline_phases        BENCH_QUANT=int8-all BENCH_PHASES=1
run headline_paced_phases  BENCH_QUANT=int8-all BENCH_PACED=1 BENCH_PHASES=1
run headline_beam5         BENCH_QUANT=int8-all BENCH_BEAM=5
run headline_beam5_phases  BENCH_QUANT=int8-all BENCH_BEAM=5 BENCH_PHASES=1
run headline_beam5_kv      BENCH_QUANT=int8-kv  BENCH_BEAM=5
run headline_2s_int8all    BENCH_QUANT=int8-all BENCH_CHUNK=2.0
# int4 tier (nibble-packed g128): measured for the record — step-time parity
# with int8 expected (XLA materializes the S4 convert); the win is residency
run headline_int4all       BENCH_QUANT=int4-all
run headline_int4all_phases BENCH_QUANT=int4-all BENCH_PHASES=1

# --- B: scenarios (3/5 + phases first: they gate round-4 fixes) ------------
run scenario5              BENCH_SCENARIO=5
run scenario5_phases       BENCH_SCENARIO=5 BENCH_PHASES=1
run scenario5_novad        BENCH_SCENARIO=5 BENCH_NOVAD=1
run scenario3              BENCH_SCENARIO=3
run scenario3_phases       BENCH_SCENARIO=3 BENCH_PHASES=1
run scenario1              BENCH_SCENARIO=1
run scenario2              BENCH_SCENARIO=2
run scenario4              BENCH_SCENARIO=4

# --- C: multi-stream capacity sweep (VERDICT r3 #2) -------------------------
for q in int8-all int8 int8-kv; do
  for n in 2 4 8 16 32; do
    run "streams${n}_${q//-/}" BENCH_STREAMS=$n BENCH_QUANT=$q
  done
done
# int4 at the capacity point: halved weight residency frees HBM for streams
run streams16_int4 BENCH_STREAMS=16 BENCH_QUANT=int4
run streams32_int4 BENCH_STREAMS=32 BENCH_QUANT=int4

echo "sweep complete: $DIR" >&2
