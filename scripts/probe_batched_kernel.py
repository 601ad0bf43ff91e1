"""Mosaic-lowering smoke for the r4 pair-block-batched fused kernel: compiles
the rollout kernel on the real TPU for a small grasp scene (exercises (S,8,128)
batched narrowphase, Jacobi sweeps, λ carry, warm start, stiction snap) and
for the panda_pick flagship, printing compile + steady-state times.

Usage: python scripts/probe_batched_kernel.py [small|pick|world] ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def small():
    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
    from mppiisaac_tpu.physics.step import Engine
    from mppiisaac_tpu.runtime.sim import broadcast_state, sample_model_params
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig, build_scene

    specs = [
        ActorSpec(type="robot", name="grip", urdf_file="mini_gripper_rail",
                  fixed=True, gravity=False, gripper_binarize=True,
                  init_pos=[0.0, 0.0, 0.5]),
        ActorSpec(type="box", name="blk", size=[0.03, 0.03, 0.03], mass=0.02,
                  init_pos=[0.0, 0.0, 0.53], friction=1.0),
    ]
    built = build_scene(specs, SimConfig(dt=0.04, substeps=2))
    engine = Engine(built.scene, use_impulse=True)
    K, H = 1024, 4
    nu = built.cmd_map.nu

    def cost(view, t):
        b = view.actor_pos("blk")
        return jnp.sqrt(b[0] * b[0] + b[1] * b[1] + 1e-12)

    t0 = time.perf_counter()
    fused = FusedRollout(built, engine, cost_fn=cost, H=H, K=K, vis_body=None,
                         interpret=jax.default_backend() == "cpu",
                         impulse_sweeps=4, world_fidelity=True)
    state_K = broadcast_state(built.initial_state(engine), K)
    params_K = sample_model_params(built, engine, K, seed=7)
    V = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (K, H, nu)), np.float32)
    costs, _ = fused.rollout(state_K, params_K, V)
    s = float(np.asarray(costs).sum())
    print(f"small grasp: compile+run {time.perf_counter()-t0:.1f}s cost_sum={s:.4f}")
    t0 = time.perf_counter()
    for _ in range(10):
        costs, _ = fused.rollout(state_K, params_K, V)
    float(np.asarray(costs).sum())
    print(f"small grasp: {(time.perf_counter()-t0)/10*1e3:.2f} ms/call")


def pick(fidelity="fast", sweeps=1, manifold="reduced"):
    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config
    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout

    K, H = 1000, 30
    cfg = load_config(
        "tasks/panda_pick",
        [f"mppi.num_samples={K}", f"mppi.horizon={H}",
         f"mppi.rollout_fidelity={fidelity}"],
    )
    planner = MPPIisaacPlanner(cfg, PandaPickObjective(cfg), randomize=True,
                               use_fused=False)
    built, engine = planner.built, planner.sim.engine
    cost_fn = planner.objective.kernel_cost(built.scene)
    vis_body = built.visualize_bodies[0] if built.visualize_bodies else None
    t0 = time.perf_counter()
    fr = FusedRollout(built, engine, cost_fn=cost_fn, H=H, K=K,
                      vis_body=vis_body,
                      interpret=jax.default_backend() == "cpu",
                      impulse_sweeps=int(sweeps),
                      world_fidelity=fidelity == "world", manifold=manifold)
    state_K, params_K = planner.sim.state, planner._params_K
    V = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (K, H, built.cmd_map.nu),
                                jnp.float32)
    run = jax.jit(fr.rollout)
    costs, _ = run(state_K, params_K, V)
    s = float(np.asarray(costs).sum())
    print(f"pick {fidelity}/sw{sweeps}/{manifold}: compile "
          f"{time.perf_counter()-t0:.1f}s cost_sum={s:.1f}")
    t0 = time.perf_counter()
    for _ in range(10):
        costs, _ = run(state_K, params_K, V)
    float(np.asarray(costs).sum())
    print(f"pick {fidelity}/sw{sweeps}/{manifold}: "
          f"{(time.perf_counter()-t0)/10*1e3:.2f} ms/call")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode == "small":
        small()
    else:
        pick(*(sys.argv[2:] or []))
