#!/bin/bash
# Round-5 batch D — substep frontier at WORLD fidelity. The engine refines
# panda_pick to 4 substeps (dt_sub <= 12.5 ms) — a threshold tuned against
# the pre-r5 couple damping whose phantom forces needed small steps. With the
# damper capped (5db8562), coarser rollout integration may keep the task bar:
# rollout_substeps=3 -> ~1.33x control rate, =2 -> ~2x (the >=500 Hz target).
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5c COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run pick_sub3   8000 python scripts/validate.py pick world 10 panda_pick 3
run bench_sub3  3000 env BENCH_SUBSTEPS=3 python bench.py
run pick_sub2   8000 python scripts/validate.py pick world 10 panda_pick 2
run bench_sub2  3000 env BENCH_SUBSTEPS=2 python bench.py
# world fidelity, single Jacobi sweep: r4 measured 7/10 under the phantom
# couple damping; retest post-fix (keeps lambda carry + snap)
run pick_sw1    8000 python scripts/validate.py pick world 10 panda_pick "" 1
run bench_sw1   3000 env BENCH_SWEEPS=1 python bench.py
# stack the winners if sub3 passes: substeps=3 + sweeps=1
run pick_s3w1   8000 python scripts/validate.py pick world 10 panda_pick 3 1
run bench_s3w1  3000 env BENCH_SUBSTEPS=3 BENCH_SWEEPS=1 python bench.py
echo "BATCH r5d COMPLETE $(date)" >> /tmp/r5_progress.log
