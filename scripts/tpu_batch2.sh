#!/bin/bash
# Follower batch: waits for tpu_batch.sh to finish, then benchmarks and
# task-validates the reduced-substep fast-fidelity planner model.
cd /root/repo

while ! grep -q "BATCH COMPLETE" /tmp/v_progress.log 2>/dev/null; do sleep 30; done

run() {
  local name=$1; shift
  local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/v_progress.log
  timeout "$to" "$@" > "/tmp/v_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/v_${name}.log"
  echo "=== $name done $(date)" >> /tmp/v_progress.log
}

run pick_sub2   1500 python scripts/validate.py pick fast 5 panda_pick 2
run bench_sub2  1500 env BENCH_FIDELITY=fast BENCH_SUBSTEPS=2 python bench.py
run bench_fast  1500 env BENCH_FIDELITY=fast python bench.py
echo "BATCH2 COMPLETE $(date)" >> /tmp/v_progress.log
