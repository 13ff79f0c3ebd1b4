#!/bin/bash
# Round-4 chip queue #3: re-run the three queue-2 items that crashed and
# were fixed afterwards:
#   1. spatial mesh-of-1 packed seg-step overhead (bench_spatial_onchip
#      re-puts model vars per state now)  -> SPATIAL_ONCHIP_r04.json
#   2. a REAL overflow-guard escalation (escalate past MAX_PACKED_DISP now
#      converts to the unbounded-XLA-warp switch instead of crashing)
#      -> ESCALATION_r04.log regenerated with the successful run
#   3. end-to-end accuracy parity run (init_vars stay on host now)
#      -> PARITY_RUN.json
# Runs detached; log in /tmp/r04_queue3.log.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r04_queue3.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r04 queue3 start $(date +%T)" >> "$LOG"
echo "--- spatial onchip overhead $(date +%T)" >> "$LOG"
timeout 1800 python -u tools/bench_spatial_onchip.py --iters 5 >> "$LOG" 2>&1
echo "--- guard escalation run $(date +%T)" >> "$LOG"
timeout 3000 python -u train_deepatlas.py --num-epochs 1 --num-samples 21 \
  --n-labeled 1 --max-validation-pairs 1 --data-root /tmp/mb_full \
  --log-root /tmp/r04_guard_logs > /tmp/r04_escalation.log 2>&1
grep -n "escalat" /tmp/r04_escalation.log | head -5 >> "$LOG"
{ echo "# Guard escalation on chip (train_deepatlas.py defaults:"
  echo "# mode=escalate, threshold=0.05, patience=10, max_disp=8)."
  echo "# The first escalation asks for max_disp 8 -> 16, which exceeds"
  echo "# the packed kernels' MAX_PACKED_DISP=10, so the guard converts"
  echo "# to the exact unbounded XLA warp and training continues."
  echo "# Trimmed from /tmp/r04_escalation.log ($(date -u +%F)):"
  head -12 /tmp/r04_escalation.log
  echo "[...]"
  grep -n "disp_overflow\|escalat\|max_disp\|XLA warp\|epoch\|loss" \
    /tmp/r04_escalation.log | head -40; } > ESCALATION_r04.log
echo "--- parity run $(date +%T)" >> "$LOG"
timeout 3000 python -u tools/parity_run.py >> "$LOG" 2>&1
echo "=== r04 queue3 done $(date +%T)" >> "$LOG"
