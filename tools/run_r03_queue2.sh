#!/bin/bash
# Round-3 chip queue #2: typical-regime headline + joint phase split.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r03_queue2.log
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== r03 queue2 start $(date +%T)" >> "$LOG"
echo "--- bench typical $(date +%T)" >> "$LOG"
timeout 3600 python -u bench.py --regime typical >> "$LOG" 2>&1
echo "--- bench_joint phase split $(date +%T)" >> "$LOG"
timeout 3600 python -u tools/bench_joint.py >> "$LOG" 2>&1
echo "=== r03 queue2 done $(date +%T)" >> "$LOG"
