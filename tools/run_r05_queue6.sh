#!/bin/bash
# Round-5 chip queue #6 (runs after queue5; serialized — single-tenant chip):
#   1. warm-cache default bench, timed -> BENCH_WARM_r05.json
#      (driver-window evidence for round-4 VERDICT next #2: the driver
#      runs `python bench.py` cold-process but warm-compile-cache)
#   2. multi-plane block-conv forward microbench -> BLOCK_CONV_r05.json
#      (VERDICT #9: adopt or rule out the fused-dot seg-step lever with a
#      kernel-level measurement)
# Progress log: /tmp/r05_queue6.log
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r05_queue6.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r05 queue6 start $(date +%T)" >> "$LOG"

if [ -f /tmp/r05_queue5.pid ]; then
  QP=$(cat /tmp/r05_queue5.pid)
  while kill -0 "$QP" 2>/dev/null; do sleep 15; done
fi
echo "--- queue5 finished $(date +%T)" >> "$LOG"

T0=$(date +%s)
timeout 1800 python -u bench.py > /tmp/r05_bench_warm.log 2>&1
RC=$?
T1=$(date +%s)
LINE=$(grep -v WARNING /tmp/r05_bench_warm.log | grep '^{' | tail -1)
python - "$RC" "$((T1 - T0))" <<'EOF'
import json, sys
rc, secs = int(sys.argv[1]), int(sys.argv[2])
try:
    with open('/tmp/r05_bench_warm.log') as f:
        line = [l for l in f if l.startswith('{')][-1]
    data = json.loads(line)
except Exception:
    data = None
out = {"metric": "python bench.py (default args) wall seconds, warm "
                 "persistent compile cache — the regime the driver's "
                 "round-end run sees",
       "wall_seconds": secs, "rc": rc,
       "headline": (None if data is None else
                    {k: data[k] for k in ("value", "unit", "vs_baseline")})}
with open('BENCH_WARM_r05.json', 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
echo "warm default bench rc=$RC secs=$((T1 - T0))" >> "$LOG"

echo "--- block conv microbench $(date +%T)" >> "$LOG"
timeout 2700 python -u tools/bench_block_conv.py --iters 10 \
  > /tmp/r05_block_conv.log 2>&1
RC=$?
grep -v WARNING /tmp/r05_block_conv.log | tail -30 > BLOCK_CONV_r05.log
echo "block conv rc=$RC" >> "$LOG"

echo "=== r05 queue6 done $(date +%T)" >> "$LOG"
