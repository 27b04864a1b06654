#!/bin/bash
# Round-5 bench sweep. Rows map to VERDICT r4's asks:
#   - headline / headline_phases: current as-fast operating point (+ split)
#   - headline_paced + headline_paced_phases: the paced accounting row
#     (#4 — prove RTF = compute + exactly one ~26-31 ms sync, keepalive gated)
#   - headline_beam5 (+phases): beam with ancestry attention (no per-step
#     self-KV reorder; #5 — push toward <=0.08)
#   - beam5_kvquant: beam + int8-kv (halved KV streaming under beam's 5x
#     self-KV reads — the mode's best-case niche)
#   - scenario1..5: acceptance configs through StreamingApp, now auto-running
#     the async pipelined tick loop for as-fast feeds (#2)
#   - scenario5_phases: sync-forced split of whatever remains over target
#   - streams16/32 int8-all: capacity re-validation on round-5 code
#   - streams48/64 int8-all vs int4-all vs int8-kv: the capacity experiment
#     int4's existence implies (#6) — int8-kv is the tier that actually raises
#     the HBM dispatch ceiling (serving._hbm_safe_batch kv_quant sizing)
# Idempotent; publish with: python tools/publish_bench.py DIR --round 5
set -u
DIR="${1:-/tmp/bench_r5}"
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

run headline                 BENCH_QUANT=int8-all
run headline_phases          BENCH_QUANT=int8-all BENCH_PHASES=1
run headline_split           BENCH_QUANT=int8-all RWA_D2H_SPLIT=1
run headline_paced           BENCH_QUANT=int8-all BENCH_PACED=1
run headline_paced_phases    BENCH_QUANT=int8-all BENCH_PACED=1 BENCH_PHASES=1
run headline_paced_split     BENCH_QUANT=int8-all BENCH_PACED=1 RWA_D2H_SPLIT=1
run headline_beam5           BENCH_QUANT=int8-all BENCH_BEAM=5
run headline_beam5_phases    BENCH_QUANT=int8-all BENCH_BEAM=5 BENCH_PHASES=1
run headline_beam5_split     BENCH_QUANT=int8-all BENCH_BEAM=5 RWA_D2H_SPLIT=1
run beam5_kvquant            BENCH_QUANT=int8-kv BENCH_BEAM=5
run scenario1                BENCH_SCENARIO=1
run scenario2                BENCH_SCENARIO=2
run scenario3                BENCH_SCENARIO=3
run scenario4                BENCH_SCENARIO=4
run scenario5                BENCH_SCENARIO=5
run scenario5_phases         BENCH_SCENARIO=5 BENCH_PHASES=1
run streams16_int8all        BENCH_STREAMS=16 BENCH_QUANT=int8-all
run streams32_int8all        BENCH_STREAMS=32 BENCH_QUANT=int8-all
run streams48_int8all        BENCH_STREAMS=48 BENCH_QUANT=int8-all
run streams48_int4all        BENCH_STREAMS=48 BENCH_QUANT=int4-all
run streams48_int8kv         BENCH_STREAMS=48 BENCH_QUANT=int8-kv
run streams64_int8all        BENCH_STREAMS=64 BENCH_QUANT=int8-all
run streams64_int8kv         BENCH_STREAMS=64 BENCH_QUANT=int8-kv
echo "sweep complete: $DIR" >&2
