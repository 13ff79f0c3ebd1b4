#!/bin/bash
# Round-5 chip queue #4 (consolidated; serialized — single-tenant chip):
#   1. spatial mesh-of-1 seg step (degenerate-mesh fast path)
#                                          -> SPATIAL_ONCHIP_r05.json
#   2. DP mesh-of-1 joint step (degenerate-mesh fast path)
#                                          -> DP_ONCHIP_r05.json
#   3. reg-phase breakdown (hoisted kernels) -> /tmp/r05_reg_phase.log
#   4. regime-complete bench (--full)      -> BENCH_REGIMES_r05.json
#   5. guard-escalation full-size run, 3 epochs: 8 -> 10 -> XLA fallback
#      (mitigated: bf16 anatomy + seg-apply remat), >= 50 post-switch
#      iterations                          -> ESCALATION_r05.log
#   6. 3-seed trajectory parity vs torch   -> PARITY_RUN.json
# Progress log: /tmp/r05_queue4.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r05_queue4.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r05 queue4 start $(date +%T)" >> "$LOG"

echo "--- spatial mesh-of-1 onchip $(date +%T)" >> "$LOG"
timeout 3600 python -u tools/bench_spatial_onchip.py \
  --out SPATIAL_ONCHIP_r05.json > /tmp/r05_spatial_onchip.log 2>&1
tail -3 /tmp/r05_spatial_onchip.log | grep -v WARNING >> "$LOG"

echo "--- DP mesh-of-1 onchip $(date +%T)" >> "$LOG"
timeout 3600 python -u tools/bench_dp_onchip.py \
  --out DP_ONCHIP_r05.json > /tmp/r05_dp_onchip.log 2>&1
tail -3 /tmp/r05_dp_onchip.log | grep -v WARNING >> "$LOG"

echo "--- reg phase breakdown (hoisted kernels) $(date +%T)" >> "$LOG"
timeout 3600 python -u tools/bench_reg_phase.py --regime worst \
  > /tmp/r05_reg_phase.log 2>&1
grep -v WARNING /tmp/r05_reg_phase.log | tail -14 >> "$LOG"

echo "--- full regime bench $(date +%T)" >> "$LOG"
timeout 7200 python -u bench.py --full > /tmp/r05_bench_full.log 2>&1
RC=$?
grep -v WARNING /tmp/r05_bench_full.log | grep '^{' | tail -1 \
  > BENCH_REGIMES_r05.json
echo "bench --full rc=$RC bytes=$(wc -c < BENCH_REGIMES_r05.json)" >> "$LOG"

echo "--- guard escalation run (3 epochs, full size) $(date +%T)" >> "$LOG"
timeout 9000 python -u train_deepatlas.py --num-epochs 3 --num-samples 21 \
  --n-labeled 1 --max-validation-pairs 1 --data-root /tmp/mb_full \
  --debug --log-root /tmp/r05_guard_logs > /tmp/r05_escalation.log 2>&1
RC=$?
grep -n "escalat\|XLA warp" /tmp/r05_escalation.log | head -5 >> "$LOG"
N_ITERS=$(grep -c "^Epoch\[" /tmp/r05_escalation.log)
{ echo "# Guard escalation on chip (train_deepatlas.py defaults:"
  echo "# mode=escalate, threshold=0.05, patience=10, max_disp=8;"
  echo "# 3 epochs x 42 iters, n_labeled=1 so fields saturate)."
  echo "# Ladder: 8 -> 10 (MAX_PACKED_DISP, still exact Pallas) -> the"
  echo "# unbounded XLA warp with bf16 anatomy + seg-apply remat."
  echo "# exit code: $RC (0 = the full run COMPLETED); Epoch-iter"
  echo "# prints: $N_ITERS (42/epoch; the XLA switch lands in epoch 1,"
  echo "# so prints after the switch line prove >= 50 post-escalation"
  echo "# iterations)."
  echo "# Trimmed from /tmp/r05_escalation.log ($(date -u +%F)):"
  grep -v "WARNING" /tmp/r05_escalation.log | head -10
  echo "[...]"
  grep -n "disp_overflow\|escalat\|max_disp\|XLA warp\|Epoch\[\|Validation\|Finished\|Error\|error\|RESOURCE" \
    /tmp/r05_escalation.log | tail -60; } > ESCALATION_r05.log
echo "escalation rc=$RC epoch-prints=$N_ITERS" >> "$LOG"

echo "--- 3-seed parity run $(date +%T)" >> "$LOG"
timeout 7200 python -u tools/parity_run.py > /tmp/r05_parity.log 2>&1
RC=$?
echo "parity rc=$RC" >> "$LOG"
grep -v WARNING /tmp/r05_parity.log | tail -6 >> "$LOG"

echo "=== r05 queue4 done $(date +%T)" >> "$LOG"
