#!/bin/bash
# Round-5 chip queue #5 (resumed session; serialized — single-tenant chip).
# Waits for the in-flight default bench (pid in /tmp/r05_bench1.pid), then:
#   1. record the default-bench JSON + wall time -> BENCH_DEFAULT_r05.json
#      (evidence the driver-window default parses; round-4 VERDICT next #2)
#   2. guard-escalation full-size run, 3 epochs: 8 -> 10 (MAX_PACKED_DISP)
#      -> unbounded XLA warp (bf16 anatomy + seg-apply remat), >= 50
#      post-switch iterations        -> ESCALATION_r05.log  (VERDICT #1)
#   3. regime-complete bench --full  -> BENCH_REGIMES_r05.json (VERDICT #4)
#   4. 3-seed trajectory parity      -> PARITY_RUN.json       (VERDICT #7)
# Progress log: /tmp/r05_queue5.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r05_queue5.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r05 queue5 start $(date +%T)" >> "$LOG"

# --- 0. wait for the in-flight default bench (cache warmer)
if [ -f /tmp/r05_bench1.pid ]; then
  BP=$(cat /tmp/r05_bench1.pid)
  while kill -0 "$BP" 2>/dev/null; do sleep 10; done
fi
echo "--- default bench done $(date +%T)" >> "$LOG"
grep '^{' /tmp/r05_bench1.log | tail -1 > BENCH_DEFAULT_r05.json
echo "default bench bytes=$(wc -c < BENCH_DEFAULT_r05.json)" >> "$LOG"

# --- wait for the synthetic corpus if still generating
if [ -f /tmp/r05_mkcorpus.pid ]; then
  CP=$(cat /tmp/r05_mkcorpus.pid)
  while kill -0 "$CP" 2>/dev/null; do sleep 5; done
fi

# --- 2. guard escalation run (full size, 3 epochs, n_labeled=1 so the
#        pair mix is dominated by unlabeled pairs and fields saturate)
echo "--- guard escalation run (3 epochs, full size) $(date +%T)" >> "$LOG"
timeout 5400 python -u train_deepatlas.py --num-epochs 3 --num-samples 21 \
  --n-labeled 1 --max-validation-pairs 1 --data-root /tmp/mb_full \
  --debug --log-root /tmp/r05_guard_logs > /tmp/r05_escalation.log 2>&1
RC=$?
SWITCH_LINE=$(grep -n "switching to the unbounded XLA warp path" \
  /tmp/r05_escalation.log | tail -1 | cut -d: -f1)
if [ -n "$SWITCH_LINE" ]; then
  POST=$(tail -n +"$SWITCH_LINE" /tmp/r05_escalation.log \
    | grep -c "^Epoch\[")
else
  POST=0
fi
# Epoch[] prints every print_batch_period=2 iterations (debug mode), so
# post-switch iterations ~= 2 * POST.
{ echo "# Guard escalation on chip (train_deepatlas.py defaults:"
  echo "# mode=escalate, threshold=0.05, patience=10, max_disp=8;"
  echo "# 3 epochs, full 168x200x168, n_labeled=1 so fields saturate)."
  echo "# Ladder: 8 -> 10 (MAX_PACKED_DISP, the widest exact Pallas rung)"
  echo "# -> the unbounded XLA warp with bf16 anatomy + seg-apply remat"
  echo "# (the round-4 unmitigated fallback OOM'd HBM by 15.77 MiB)."
  echo "# exit code: $RC (0 = the full 3-epoch run COMPLETED)."
  echo "# Epoch[] prints AFTER the XLA-switch line: $POST (one print per"
  echo "# 2 iterations => ~$((POST * 2)) post-switch iterations; the"
  echo "# round-4 VERDICT bar is >= 50)."
  echo "# Trimmed from /tmp/r05_escalation.log ($(date -u +%F)); line"
  echo "# numbers from the raw log prove ordering:"
  grep -v "WARNING" /tmp/r05_escalation.log | head -8
  echo "[...]"
  grep -n "disp_overflow\|escalat\|max_disp\|XLA warp\|Epoch\[\|Validation\|valid\|Finished\|Traceback\|Error\|RESOURCE" \
    /tmp/r05_escalation.log | tail -80; } > ESCALATION_r05.log
echo "escalation rc=$RC post-switch-prints=$POST" >> "$LOG"

# --- 3. regime-complete bench (adds the typical-field regime; confirms
#        the splat static-sweep jtot gate fixed none|typical)
echo "--- full regime bench $(date +%T)" >> "$LOG"
timeout 5400 python -u bench.py --full > /tmp/r05_bench_full.log 2>&1
RC=$?
grep -v WARNING /tmp/r05_bench_full.log | grep '^{' | tail -1 \
  > BENCH_REGIMES_r05.json
echo "bench --full rc=$RC bytes=$(wc -c < BENCH_REGIMES_r05.json)" >> "$LOG"

# --- 4. 3-seed trajectory parity (torch on CPU, jax on the chip)
echo "--- 3-seed parity run $(date +%T)" >> "$LOG"
timeout 5400 python -u tools/parity_run.py > /tmp/r05_parity.log 2>&1
RC=$?
echo "parity rc=$RC" >> "$LOG"
grep -v WARNING /tmp/r05_parity.log | tail -4 >> "$LOG"

echo "=== r05 queue5 done $(date +%T)" >> "$LOG"
