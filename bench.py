"""Benchmark: MPPI control rate + rollout throughput on the flagship workload.

North star (BASELINE.json): panda_pick at K=1000 samples, H=30 horizon on one
TPU v5e chip; reference implied sustained throughput is 300k env-steps/s
(25 Hz × K·H=12,000 — BASELINE.md). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus auxiliary metrics on stderr.
"""
from __future__ import annotations

import json
import sys
import time

K = 1000
H = 30
WARMUP = 3
ITERS = 20
REF_ENV_STEPS_PER_SEC = 300_000.0   # reference implied sustained (BASELINE.md)

# Planner-model knobs for the benchmarked rollout kernel. The defaults are
# the FASTEST configuration that passes the flagship task-success bar, r4:
# fidelity=world (lambda carry + stiction snap), world-match substeps,
# sweeps=2, manifold=reduced — 10/10 over 10 seeds (RESULTS_r4.json
# "panda_pick:world:world-match:swd:reduced"). The r3 fast/sw1 config dropped
# to 2/10 under the Jacobi contact upgrade (fast mode's capture prediction
# was dither-luck); sweeps=1 measures 7/10 for only 7% speed, substeps=1
# 0/10. Override via env: BENCH_FIDELITY=world|fast, BENCH_SUBSTEPS=N,
# BENCH_SWEEPS=N, BENCH_MANIFOLD=full|reduced.
import os as _os

FIDELITY = _os.environ.get("BENCH_FIDELITY", "world")
SUBSTEPS = _os.environ.get("BENCH_SUBSTEPS", "")     # "" = match world sim
SWEEPS = _os.environ.get("BENCH_SWEEPS", "1")   # r5 shipped config (10/10)
MANIFOLD = _os.environ.get("BENCH_MANIFOLD", "reduced")


def main():
    import os

    import jax

    # persistent compile cache: configured by the package import itself
    # (mppiisaac_tpu/__init__.py → ~/.cache/mppiisaac_tpu/jax, threshold 0).
    # Do NOT override dir/threshold here: round 2 pointed this at a second
    # cache dir with a 10 s threshold that the axon backend's ~0 s locally
    # measured compile times never crossed — every run recompiled cold.

    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    over = [f"mppi.num_samples={K}", f"mppi.horizon={H}",
            f"mppi.rollout_fidelity={FIDELITY}"]
    if SUBSTEPS:
        over.append(f"mppi.rollout_substeps={SUBSTEPS}")
    if SWEEPS:
        over.append(f"mppi.rollout_sweeps={SWEEPS}")
    if MANIFOLD:
        over.append(f"mppi.rollout_manifold={MANIFOLD}")
    cfg = load_config("tasks/panda_pick", over)
    t0 = time.perf_counter()
    planner = MPPIisaacPlanner(cfg, PandaPickObjective(cfg), randomize=True)
    state0 = (planner.sim.state, planner._params_K)
    print(f"build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    import jax.numpy as jnp
    import numpy as np

    # pipelined measurement: CHUNK commands per dispatch via lax.scan — the
    # same structure the real control loop runs (runtime/loop._build_chunk,
    # device_steps). The r4 profile showed this tunnel's per-dispatch floor is
    # ~3.7 ms, which a python-loop-of-dispatches benchmark cannot see past:
    # it measures the tunnel, not the chip. The scanned loop measures the
    # chip's sustained command rate.
    CHUNK = 10

    def _chunk(carry, _):
        action, carry, _info = planner.mppi._command_impl(carry, state0)
        return carry, jnp.sum(action)

    run_chunk = jax.jit(
        lambda c: jax.lax.scan(_chunk, c, None, length=CHUNK)
    )

    t0 = time.perf_counter()
    carry, asum = run_chunk(planner.mppi.carry)
    float(np.asarray(asum).sum())
    print(f"compile+warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry, asum = run_chunk(carry)
    # block_until_ready on this backend reports dispatch, not execution — a
    # host read is the documented way to truly synchronize before the clock
    float(np.asarray(asum).sum())
    dt = (time.perf_counter() - t0) / (ITERS * CHUNK)

    # per-command LATENCY (independent dispatches, each host-synced): what a
    # real-time control loop sees per step, including this backend's fixed
    # per-dispatch round-trip (~47 ms on the axon tunnel; ~0 on local chips)
    a_l, _, _ = planner.mppi._command(carry, state0)   # compile outside clock
    float(np.asarray(a_l).sum())
    t0 = time.perf_counter()
    for _ in range(5):
        a_l, _, _ = planner.mppi._command(carry, state0)
        float(np.asarray(a_l).sum())
    lat_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"per-command latency (unpipelined, incl. dispatch): {lat_ms:.1f} ms",
          file=sys.stderr)

    control_hz = 1.0 / dt
    fused = planner.mppi.fused
    # rollout-model substeps (may be coarser than the world engine's)
    substeps = fused.substeps if fused is not None else planner.sim.engine.substeps
    sweeps = fused.impulse_sweeps if fused is not None else ""
    env_steps = K * H / dt                  # control-dt env steps per second
    phys_steps = env_steps * substeps       # physics substeps per second

    print(
        f"control rate: {control_hz:.1f} Hz | env-steps/s: {env_steps/1e6:.2f}M "
        f"(x{substeps} substeps → {phys_steps/1e6:.2f}M physics substeps/s) | "
        f"per-command: {dt*1e3:.2f} ms",
        file=sys.stderr,
    )
    # fidelity is folded into the metric string (advisor r2): vs_baseline
    # cannot be quoted without the planner-model fidelity it was measured at
    print(
        json.dumps(
            {
                "metric": (
                    "panda_pick rollout env-steps/sec/chip "
                    f"(K=1000, H=30, fidelity={FIDELITY}, substeps={substeps}, "
                    f"sweeps={sweeps}{', manifold=' + MANIFOLD if MANIFOLD else ''}, "
                    "pipelined scan-10 like the device_steps control loop)"
                ),
                "value": round(env_steps, 0),
                "unit": "env-steps/s",
                "vs_baseline": round(env_steps / REF_ENV_STEPS_PER_SEC, 2),
                "control_hz": round(control_hz, 1),
                "substeps_per_env_step": substeps,
                "rollout_sweeps": sweeps,
                "rollout_fidelity": FIDELITY,
            }
        )
    )


if __name__ == "__main__":
    main()
