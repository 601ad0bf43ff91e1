#!/bin/bash
# Round-5 TPU re-attestation batch — strictly ONE process at a time.
# Everything runs on the SAME HEAD SHA (r4 verdict item 1: results must be
# attested on the shipped tree). Logs: /tmp/r5_*.log, progress: /tmp/r5_progress.log
cd /root/repo
export VALIDATE_ROUND=5

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1; shift
  local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

echo "BATCH r5 START $(date) sha=$(git rev-parse --short HEAD)" >> /tmp/r5_progress.log

# 1. flagship bench on the new kernel (also warms the fused compile cache)
run bench       3000 python bench.py

# 2. flagship re-attestation: pick world-fidelity, 10 seeds
run pick_world  8000 python scripts/validate.py pick world 10

# 3. omni_panda_pick 5 seeds (pad-gap fix + damper cap — first run ever on
#    the corrected geometry)
run omni_world  6000 python scripts/validate.py omni world 5

# 4. anymal emergent gait, no prior, 5 seeds
run anymal_none 6000 python scripts/validate.py anymal 5 none

# 5. full non-pick task suite
run suite       9000 python scripts/validate.py suite

# 6. boxer_push at the reference horizon 12, 4 probed seeds
for s in 0 1 2 42; do
  run boxer_h12_s$s 2500 python scripts/validate.py one boxer_push mppi.horizon=12 mppi.seed_val=$s
done

# 7. panda_arm plannerbenchmark experiment (committed report #2)
run panda_bench 4000 python - <<'EOF'
from mppiisaac_tpu.benchmarks.runner import run_panda_benchmark
rep = run_panda_benchmark(n_trials=5)
rep.save("benchmarks/results/panda_arm.json")
import json; print(json.dumps(rep.summary(), indent=2))
EOF

echo "BATCH r5 COMPLETE $(date)" >> /tmp/r5_progress.log
