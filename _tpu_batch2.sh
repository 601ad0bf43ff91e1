#!/bin/bash
# Fires when the TPU tunnel answers; then runs the full validation batch,
# strictly one process at a time. Logs under /tmp/b2_*.log
cd /root/repo

# wait for the tunnel (single quiet probe, 5-min spacing)
while true; do
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU BACK at $(date)" | tee /tmp/tpu_back.flag
    break
  fi
  sleep 300
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1; shift
  local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/b2_progress.log
  timeout "$to" "$@" > "/tmp/b2_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/b2_${name}.log"
  echo "=== $name done $(date)" >> /tmp/b2_progress.log
}

run pick_fast   4000 python _exp33b.py fast
# fall back to world-fidelity validation only if fast-fidelity missed seeds
if ! grep -q "SUCCESS [45]/5" /tmp/b2_pick_fast.log; then
  run pick_default 4000 python _exp33b.py default
fi
run anymal_grid 7000 python _exp41.py
run suite       9000 python _exp43.py
run omni_pick   4000 python _exp42.py
run bench_matrix 7000 python _exp36.py
echo "BATCH2 COMPLETE $(date)" >> /tmp/b2_progress.log
