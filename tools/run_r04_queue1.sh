#!/bin/bash
# Round-4 chip queue #1: the measurement set round 3 scripted but never ran
# (round-3 VERDICT missing #3 / weak #3) plus the regime-complete bench
# (VERDICT next #2), measured against the CURRENT kernels (incl. the
# round-4 joint (s,dy)/(q,dy) offset lists, commit f979418).
#   1. regime-complete bench (all four label regimes x worst/typical,
#      one JSON line) -> BENCH_REGIMES_r04.json artifact
#   2. DP on-chip artifact (mesh-of-1 shard_map overhead at full size)
#   3. supervised seg-step fwd/bwd/update split
#   4. reg-phase component breakdown (round-3 VERDICT next #3)
# Runs detached; log in /tmp/r04_queue1.log.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r04_queue1.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r04 queue1 start $(date +%T)" >> "$LOG"
echo "--- bench all regimes $(date +%T)" >> "$LOG"
timeout 3000 python -u bench.py --labels all --regime all --iters 3 > BENCH_REGIMES_r04.json 2>> "$LOG"
echo "--- dp onchip $(date +%T)" >> "$LOG"
timeout 1500 python -u tools/bench_dp_onchip.py --out DP_ONCHIP_r04.json >> "$LOG" 2>&1
echo "--- profile seg step $(date +%T)" >> "$LOG"
timeout 1500 python -u tools/profile_seg_step.py --packed-levels 3 --iters 3 >> "$LOG" 2>&1
echo "--- reg phase breakdown worst $(date +%T)" >> "$LOG"
timeout 1800 python -u tools/bench_reg_phase.py --regime worst >> "$LOG" 2>&1
echo "=== r04 queue1 done $(date +%T)" >> "$LOG"
