#!/bin/bash
# Batch 3: push-task regression diagnosis — the round-2 world-fidelity
# rollout kernel (stiction + vector cone + warm start) changed push
# predictions; test whether fast fidelity restores boxer_push/stick_push.
cd /root/repo

while ! grep -q "BATCH2 COMPLETE" /tmp/v_progress.log 2>/dev/null; do sleep 30; done

run() {
  local name=$1; shift
  local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/v_progress.log
  timeout "$to" "$@" > "/tmp/v_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/v_${name}.log"
  echo "=== $name done $(date)" >> /tmp/v_progress.log
}

run boxer_push_fast 1200 python scripts/validate.py one boxer_push mppi.rollout_fidelity=fast
run stick_push_fast 1200 python scripts/validate.py one panda_stick_push mppi.rollout_fidelity=fast
run boxer_push_long 1200 python scripts/validate.py one boxer_push n_steps=500
echo "BATCH3 COMPLETE $(date)" >> /tmp/v_progress.log
