#!/bin/bash
# Round-3 chip-gated queue — run serially on the single-tenant chip once
# the axon tunnel is back.  Each stage appends to /tmp/r03_queue.log.
#   bash tools/run_r03_chip_queue.sh
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r03_queue.log
echo "=== r03 chip queue start $(date +%F\ %T)" >> "$LOG"

probe() {
  timeout 120 python -u -c "import jax; print(jax.devices())" >> "$LOG" 2>&1
}

if ! probe; then
  echo "tunnel still down, aborting $(date +%T)" >> "$LOG"
  exit 1
fi

export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

# 1. ingest-overlap evidence (VERDICT #8) — full-size seg recipe, 2 epochs
echo "--- ingest $(date +%T)" >> "$LOG"
timeout 5400 python -u tools/bench_ingest.py --data-root /tmp/mb_full \
    --out INGEST_r03.json >> "$LOG" 2>&1

# 2. packed-levels comparison (VERDICT #5: quarter-res C=64 headroom)
echo "--- seg step packed-levels $(date +%T)" >> "$LOG"
timeout 5400 python -u tools/bench_seg_step.py --packed-levels 2 3 \
    >> "$LOG" 2>&1

echo "=== r03 chip queue done $(date +%T)" >> "$LOG"
