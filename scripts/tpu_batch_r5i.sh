#!/bin/bash
# Round-5 batch I — cheap-config task-bar retest on the fixed physics: the
# r5d substep rows (sub2 8/10, sub3 9/10) and the 384-527 Hz fast/sw1 rows
# were all measured BEFORE the finger-motor fix; the drive-side stabilization
# may move any of them over the >=9/10 bar, which changes the shipped
# perf point. Runs after batch r5h.
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5h COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run pick_sub2b   8000 python scripts/validate.py pick world 10 panda_pick 2
run pick_sub2sw1 8000 python scripts/validate.py pick world 10 panda_pick 2 1
run bench_s2w1   3000 env BENCH_SUBSTEPS=2 BENCH_SWEEPS=1 python bench.py
echo "BATCH r5i COMPLETE $(date)" >> /tmp/r5_progress.log
