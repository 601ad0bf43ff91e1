#!/bin/bash
# Round-5 batch F — world fidelity with a single Jacobi sweep (keeps the
# lambda carry + stiction snap that fast mode lacks): r4 measured 7/10 under
# the phantom couple damping; retest post-fix, plus the bench number.
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5e COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run pick_sw1    8000 python scripts/validate.py pick world 10 panda_pick "" 1
run bench_sw1   3000 env BENCH_SWEEPS=1 python bench.py
echo "BATCH r5f COMPLETE $(date)" >> /tmp/r5_progress.log
