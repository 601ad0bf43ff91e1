#!/bin/bash
# Batch 5: substeps=3 frontier probe — pick success + bench.
cd /root/repo
while ! grep -q "BATCH4 COMPLETE" /tmp/v_progress.log 2>/dev/null; do sleep 30; done
run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/v_progress.log
  timeout "$to" "$@" > "/tmp/v_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/v_${name}.log"
  echo "=== $name done $(date)" >> /tmp/v_progress.log
}
run pick_sub3  1500 python scripts/validate.py pick fast 5 panda_pick 3
run bench_sub3 1500 env BENCH_FIDELITY=fast BENCH_SUBSTEPS=3 python bench.py
echo "BATCH5 COMPLETE $(date)" >> /tmp/v_progress.log
