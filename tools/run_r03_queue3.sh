#!/bin/bash
# Round-3 chip queue #3: DP on-chip artifact (round-2 VERDICT weak #2),
# semi-supervised label-branch headline benches (the m-hard / f-hard /
# soft seg-phase dispatch built this round), and the supervised seg-step
# fwd/bwd/update split.  Runs detached; results land in /tmp/r03_queue3.log
# and DP_ONCHIP_r03.json.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r03_queue3.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r03 queue3 start $(date +%T)" >> "$LOG"
echo "--- dp onchip $(date +%T)" >> "$LOG"
timeout 1500 python -u tools/bench_dp_onchip.py --out DP_ONCHIP_r03.json >> "$LOG" 2>&1
# NB all three per-label runs use --regime worst explicitly so the
# label-branch comparison is apples-to-apples (advisor finding r03);
# bench.py --labels all --regime all now covers the full matrix in one run.
echo "--- bench labels=moving $(date +%T)" >> "$LOG"
timeout 1500 python -u bench.py --labels moving --regime worst --iters 3 >> "$LOG" 2>&1
echo "--- bench labels=fixed $(date +%T)" >> "$LOG"
timeout 1500 python -u bench.py --labels fixed --regime worst --iters 3 >> "$LOG" 2>&1
echo "--- bench labels=none typical $(date +%T)" >> "$LOG"
timeout 1500 python -u bench.py --labels none --regime typical --iters 3 >> "$LOG" 2>&1
echo "--- profile seg step $(date +%T)" >> "$LOG"
timeout 1500 python -u tools/profile_seg_step.py --packed-levels 3 --iters 3 >> "$LOG" 2>&1
echo "=== r03 queue3 done $(date +%T)" >> "$LOG"
