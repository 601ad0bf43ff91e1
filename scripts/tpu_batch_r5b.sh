#!/bin/bash
# Round-5 batch B — perf-config frontier, runs after tpu_batch_r5.sh.
# Hypothesis: the r4 fast-fidelity pick crater (2/10) was the SAME
# couple-damper phantom-force instability fixed in 5db8562 (capture
# prediction was chaotic, not "dither-luck") — if fast fidelity passes the
# bar now, the 384 Hz config ships and the >=500 Hz target is in reach.
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5 COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run pick_fast   8000 python scripts/validate.py pick fast 10
run bench_fast  3000 env BENCH_FIDELITY=fast BENCH_SWEEPS=1 python bench.py
echo "BATCH r5b COMPLETE $(date)" >> /tmp/r5_progress.log
