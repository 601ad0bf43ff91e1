"""Persistent-compile-cache probe (round-4 verdict item 3).

Builds the tiny fused-rollout program from tests/test_fused_rollout.py twice
in SEPARATE processes against a fresh cache dir and reports whether the
second process hits the cache. If the trace-level HLO is byte-stable across
processes, the second run logs zero misses for the rollout program; an
unstable key (python ids, unordered iteration, per-process constants baked
into the kernel) shows up here cheaply on CPU — no TPU needed.

Usage: python scripts/cache_probe.py            # orchestrates both runs
       python scripts/cache_probe.py child      # one measured run (internal)
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = "/tmp/mppiisaac_cache_probe"


def child():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_explain_cache_misses", True)

    import logging

    logging.basicConfig(level=logging.WARNING)
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

    import jax.numpy as jnp
    import numpy as np

    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
    from mppiisaac_tpu.physics.step import Engine
    from mppiisaac_tpu.runtime.sim import broadcast_state, sample_model_params
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig, build_scene

    specs = [
        ActorSpec(type="robot", name="point_robot", urdf_file="point_robot", fixed=True),
        ActorSpec(type="sphere", name="block", size=[0.15], mass=1.0,
                  init_pos=[0.8, 0.0, 0.2], friction=0.6),
    ]
    built = build_scene(specs, SimConfig(dt=0.05, substeps=2))
    engine = Engine(built.scene, use_impulse=False)
    K, H = 8, 3
    nu = built.cmd_map.nu

    def cost(view, t):
        q = view.actor_q("point_robot")
        block = view.actor_pos("block")
        return jnp.sqrt((q[0] - block[0]) ** 2 + (q[1] - block[1]) ** 2 + 1e-12)

    fused = FusedRollout(built, engine, cost_fn=cost, H=H, K=K,
                         vis_body=None, interpret=True, impulse_sweeps=1)
    state_K = broadcast_state(built.initial_state(engine), K)
    params_K = sample_model_params(built, engine, K, seed=123)
    V = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (K, H, nu)), jnp.float32)
    costs, _ = fused.rollout(state_K, params_K, V)
    print("COSTS_SUM", float(np.asarray(costs).sum()))


def main():
    import shutil

    shutil.rmtree(CACHE, ignore_errors=True)
    os.makedirs(CACHE, exist_ok=True)
    env = dict(os.environ, MPPIISAAC_TPU_CACHE="0", JAX_PLATFORMS="cpu")
    for i in (1, 2):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child"],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        miss_lines = [l for l in (r.stderr + r.stdout).splitlines()
                      if "Miss" in l or "miss" in l]
        persisted = [l for l in (r.stderr + r.stdout).splitlines()
                     if "persistent" in l.lower() or "cache" in l.lower()]
        print(f"--- run {i}: rc={r.returncode}")
        for l in miss_lines[:20]:
            print("   ", l)
        if r.returncode:
            print(r.stderr[-3000:])
            return
        n_entries = len(os.listdir(CACHE))
        print(f"    cache entries after run {i}: {n_entries}")
    print("If run 2 shows 'Miss' lines for jit_rollout, the key is unstable "
          "at the trace level; if not, the instability is backend-side.")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child()
    else:
        main()
