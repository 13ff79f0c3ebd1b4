#!/bin/bash
# Round-4 chip queue #4 (serialized — the chip is single-tenant and the
# host has one core):
#   1. spatial-overhead probe (isolate the 22.9 s mesh-of-1 backward,
#      SPATIAL_ONCHIP_r04)               -> /tmp/probe_spatial.log
#   2. reg-phase breakdown with the FUSED anatomy value+grad kernel
#                                        -> /tmp/r04_reg_phase_fused.log
#   3. overflow-guard escalation, re-run on the fixed tree (the 15:27
#      attempt used a mid-edit tree and crashed on a signature mismatch)
#                                        -> ESCALATION_r04.log
#   4. end-to-end accuracy parity, 20 epochs tail-mean criterion
#                                        -> PARITY_RUN.json
#   5. regime-complete bench re-record (splat fast path + fused anatomy)
#                                        -> BENCH_REGIMES_r04.json
# Runs detached; progress log in /tmp/r04_queue4.log.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r04_queue4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r04 queue4 start $(date +%T)" >> "$LOG"

echo "--- spatial overhead probe $(date +%T)" >> "$LOG"
timeout 3600 python -u tools/probe_spatial_overhead.py \
  > /tmp/probe_spatial.log 2>&1
tail -8 /tmp/probe_spatial.log >> "$LOG"

echo "--- reg phase breakdown (fused anatomy) $(date +%T)" >> "$LOG"
timeout 3600 python -u tools/bench_reg_phase.py --regime worst \
  > /tmp/r04_reg_phase_fused.log 2>&1
tail -12 /tmp/r04_reg_phase_fused.log >> "$LOG"

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

echo "--- parity run (20 epochs, tail-mean) $(date +%T)" >> "$LOG"
timeout 5400 python -u tools/parity_run.py >> "$LOG" 2>&1

echo "--- regime-complete bench $(date +%T)" >> "$LOG"
timeout 7200 python -u bench.py > /tmp/r04_bench_full.log 2>&1
tail -1 /tmp/r04_bench_full.log > BENCH_REGIMES_r04.json
tail -1 /tmp/r04_bench_full.log >> "$LOG"

echo "=== r04 queue4 done $(date +%T)" >> "$LOG"
