"""Does the planner's ROLLOUT MODEL predict the omni grasp? (r5)

From a planner-stall straddle (diag_omni_teleport protocol), run ONE scripted
close+lift action tape through (a) the WORLD step (fused world kernel on TPU)
and (b) the planner's FusedRollout at the shipped rollout config — and compare
block trajectories. The h=24 teleport diag shows the planner outputs ~0 from
a PERFECT straddle, which is only rational if the model predicts no value in
closing; a world-holds/model-drops divergence here indicts the rollout model.

Usage: python scripts/diag_omni_model.py [stall_steps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(stall_steps=896):
    import jax
    import jax.numpy as jnp

    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.runtime.loop import _build_chunk
    from mppiisaac_tpu.runtime.sim import Simulation, broadcast_state
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", [])
    obj = OmniPandaPickObjective(cfg)
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    planner = MPPIisaacPlanner(cfg, obj)
    chunk, _ = _build_chunk(cfg, world, planner, device_steps=16)
    step = 0
    while step < int(stall_steps):
        planner.objective.reset()
        carry, wstate, _ = chunk(planner.mppi.carry, world.state)
        planner.mppi.carry = carry
        world.state = wstate
        step += 16
    fl = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
    fr = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
    mid = 0.5 * (fl + fr)
    world.set_actor_position_by_name(
        "block", np.array([mid[0], mid[1], max(0.292, mid[2] - 0.045)], np.float32))
    ds = np.asarray(world.state.dof_state[0]).copy()
    ds[-2:, 0] = 0.038
    ds[:, 1] = 0.0
    world.set_dof_state(ds)
    straddle = world.state
    bi = world.built.scene.actor_index("block")

    # scripted tape: 10 steps close (fingers -6), then 20 steps close+lift
    # (shoulder -4 Nm, elbow +4 Nm, wrist -2 — the lift direction of
    # diag_omni_squeeze3's PASS); all other efforts zero (gravity=false robot)
    nu = world.nu
    H = 30
    tape = np.zeros((H, nu), np.float32)
    tape[:, -2:] = -6.0
    tape[10:, 4] = -4.0
    tape[10:, 6] = +4.0
    tape[10:, 8] = -2.0

    # (a) WORLD (fused world kernel)
    world.state = straddle
    zs_w, bg_w = [], []
    g = np.asarray(world.get_actor_position_by_name("goal"))[0]
    for t in range(H):
        world.apply_robot_cmd(tape[t][None])
        world.step()
        b = np.asarray(world.get_actor_position_by_name("block"))[0]
        zs_w.append(float(b[2]))
        bg_w.append(float(np.linalg.norm(b - g)))
    print(f"WORLD : blk z {zs_w[0]:.3f} -> {zs_w[-1]:.3f}; |b-g| {bg_w[0]:.3f} -> {bg_w[-1]:.3f}",
          flush=True)

    # (b) the planner's rollout model (FusedRollout, shipped rollout config)
    built, engine = world.built, world.engine
    K = 8
    import jax as _jax

    st1 = _jax.tree.map(lambda x: x[0], straddle)
    state_K = broadcast_state(st1, K)
    from mppiisaac_tpu.runtime.sim import sample_model_params

    params_K = sample_model_params(built, engine, K, seed=10**9)

    def cost_fn(view, t):
        b = view.actor_pos("block")
        gz = (float(g[0]), float(g[1]), float(g[2]))
        from mppiisaac_tpu.ops.pallas import lanes as L

        return L.norm3(L.sub3(b, gz), eps=1e-12)

    V = jnp.asarray(np.broadcast_to(tape, (K, H, nu)).copy())
    print("WORLD |b-g| per step:   ",
          " ".join(f"{v:.3f}" for v in bg_w), flush=True)
    for sw in (2, 4, 8):
        fused = FusedRollout(
            built, engine, cost_fn=cost_fn, H=H, K=K, vis_body=None,
            interpret=False, impulse_sweeps=sw,
        )
        costs, _ = fused.rollout(state_K, params_K, V)
        costs = np.asarray(costs)
        row = costs[0] if costs.ndim == 2 else costs
        print(f"FUSED sw={sw} |b-g|/step:",
              " ".join(f"{v:.3f}" for v in np.ravel(row)[:H]), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 896)
