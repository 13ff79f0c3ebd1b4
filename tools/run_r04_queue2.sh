#!/bin/bash
# Round-4 chip queue #2: the evidence set after queue #1
#   1. regenerate the full-size synthetic MB101 corpus (host CPU)
#   2. DP-batch loader ingest rate (round-3 VERDICT next #8 artifact)
#   3. spatial mesh-of-1 overhead of the packed seg step (next #5)
#   4. a REAL overflow-guard escalation on chip, captured in a log
#      (next #7: default escalate mode, untrained net saturates max_disp=8
#      for patience=10 joint iterations -> "escalating max_disp" fires)
#   5. end-to-end accuracy parity run, both frameworks (next #6)
# Runs detached; log in /tmp/r04_queue2.log.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r04_queue2.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r04 queue2 start $(date +%T)" >> "$LOG"
if [ ! -d /tmp/mb_full/mindboggle/image_in_MNI152_normalized ]; then
  echo "--- synth corpus $(date +%T)" >> "$LOG"
  timeout 1800 python -u tools/make_synth_corpus.py --root /tmp/mb_full >> "$LOG" 2>&1
fi
echo "--- dp loader ingest $(date +%T)" >> "$LOG"
timeout 1200 python -u tools/bench_ingest.py --loader-only --batch-size 8 \
  --out INGEST_DP_r04.json >> "$LOG" 2>&1
echo "--- spatial onchip overhead $(date +%T)" >> "$LOG"
timeout 1800 python -u tools/bench_spatial_onchip.py --iters 5 >> "$LOG" 2>&1
echo "--- guard escalation run $(date +%T)" >> "$LOG"
timeout 2400 python -u train_deepatlas.py --num-epochs 1 --num-samples 21 \
  --n-labeled 1 --max-validation-pairs 1 --data-root /tmp/mb_full \
  --log-root /tmp/r04_guard_logs > /tmp/r04_escalation.log 2>&1
grep -n "escalat" /tmp/r04_escalation.log | head -5 >> "$LOG"
{ echo "# Guard escalation on chip (train_deepatlas.py defaults:"
  echo "# mode=escalate, threshold=0.05, patience=10, max_disp=8)."
  echo "# Trimmed from /tmp/r04_escalation.log ($(date -u +%F)):"
  head -30 /tmp/r04_escalation.log
  echo "[...]"
  grep -n "disp_overflow\|escalat\|max_disp" /tmp/r04_escalation.log \
    | head -40; } > ESCALATION_r04.log
echo "--- parity run $(date +%T)" >> "$LOG"
timeout 3000 python -u tools/parity_run.py >> "$LOG" 2>&1
echo "=== r04 queue2 done $(date +%T)" >> "$LOG"
