#!/bin/bash
# Round-5 batch N — omni with reference eta bounds 5/3 (now in conf):
# h12 10-seed re-estimate + halton-spline combo.
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5m COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done
run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}
run omni_lam12_eta  9000 env VALIDATE_EXTRA=mppi.update_lambda=true,mppi.horizon=12,mppi.eta_u_bound=5,mppi.eta_l_bound=3 python scripts/validate.py omni world 10
run omni_spl12_lam  9000 env VALIDATE_EXTRA=mppi.update_lambda=true,mppi.horizon=12,mppi.mppi_mode=halton-spline python scripts/validate.py omni world 5
echo "BATCH r5n COMPLETE $(date)" >> /tmp/r5_progress.log
