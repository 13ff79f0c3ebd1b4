#!/bin/bash
# Round-5 chip queue #3 (serialized after queue2 — single-tenant chip):
#   1. regime-complete bench (--full: worst + typical fields, all four
#      label regimes) -> BENCH_REGIMES_r05.json; confirms the splat
#      fast-path gating fixed the none|typical regression (VERDICT #4)
#   2. 3-seed trajectory parity vs torch-CPU -> PARITY_RUN.json
#      (VERDICT #7)
# Progress log: /tmp/r05_queue3.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r05_queue3.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r05 queue3 start $(date +%T)" >> "$LOG"

echo "--- full regime bench $(date +%T)" >> "$LOG"
timeout 7200 python -u bench.py --full > /tmp/r05_bench_full.log 2>&1
RC=$?
grep -v WARNING /tmp/r05_bench_full.log | grep '^{' | tail -1 \
  > BENCH_REGIMES_r05.json
echo "bench --full rc=$RC bytes=$(wc -c < BENCH_REGIMES_r05.json)" >> "$LOG"

echo "--- 3-seed parity run $(date +%T)" >> "$LOG"
timeout 7200 python -u tools/parity_run.py > /tmp/r05_parity.log 2>&1
RC=$?
echo "parity rc=$RC" >> "$LOG"
grep -v WARNING /tmp/r05_parity.log | tail -6 >> "$LOG"

echo "=== r05 queue3 done $(date +%T)" >> "$LOG"
