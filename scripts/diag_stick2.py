"""panda_stick_push freeze probe (round-3).

diag_stick.py showed the episode freezes after the block lands rotated at
(0.64, 0.42): the EE sits 10 cm away and the solver converges to null action
for 1300 steps. This probe isolates whether that is (a) world physics — the
block cannot be pushed from the frozen pose — or (b) the planner MODEL — the
fused rollout kernel predicts no block motion, so no sample wins.

Procedure: run the task to the frozen state, then replay scripted joint-sweep
tapes (shoulder pan ±0.2 rad/s) through BOTH the real world step and the
FusedRollout planner model from the identical state, reporting block motion
(world) and the block_to_goal-weighted cost trace (rollout).

Usage: python scripts/diag_stick2.py [freeze_steps]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(freeze_steps=300):
    import jax
    import jax.numpy as jnp

    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.runtime.sim import Simulation, sample_model_params
    from mppiisaac_tpu.tasks.panda_stick_push import PandaStickPushObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/panda_stick_push", None)
    obj = PandaStickPushObjective(cfg)
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    # cfg.goal is None for this task (the reference leaves the marker at its
    # yaml pose [1,1,0.5]); np.asarray(None, float64) is NaN — guard like
    # run_task does, or the NaN goal poisons the whole scene
    if getattr(cfg, "goal", None) is not None:
        gp = np.asarray(world.get_actor_position_by_name("goal"))[0].astype(np.float64)
        g = np.asarray(cfg.goal, dtype=np.float64).reshape(-1)
        gp[: len(g)] = g[:3]
        world.set_actor_position_by_name("goal", gp)
    planner = MPPIisaacPlanner(cfg, obj, randomize=True)
    bi = world.scene.actor_index("panda_push_block")

    for step in range(int(freeze_steps)):
        a = planner.compute_action_from_state(world.state)
        world.apply_robot_cmd(a)
        world.step()
        if step % 50 == 0:
            b = np.asarray(world.state.root_pos[0, bi])
            print(f"freeze-run step {step}: block=({b[0]:+.3f},{b[1]:+.3f})",
                  flush=True)

    state0 = world.state
    b0 = np.asarray(state0.root_pos[0, bi])
    ee0 = np.asarray(world.view.link_position("panda_ee_tip", "panda"))[0]
    print(json.dumps({"phase": "frozen", "block": b0.tolist(),
                      "ee": ee0.tolist()}), flush=True)

    # last action the planner settled on (≈ null if frozen)
    a = planner.compute_action_from_state(state0)
    print(json.dumps({"phase": "planner_action",
                      "action": np.asarray(a).round(4).tolist()}), flush=True)

    nu = world.built.cmd_map.nu
    H = 40
    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout

    for jdof in (0, 1):
        for sgn in (+1.0, -1.0):
            tape = np.zeros((H, nu), np.float32)
            tape[:, jdof] = 0.2 * sgn

            # -------- world replay --------
            world.restore_state(state0)
            for t in range(H):
                world.apply_robot_cmd(jnp.asarray(tape[t][None]))
                world.step()
            b1 = np.asarray(world.state.root_pos[0, bi])
            ee1 = np.asarray(world.view.link_position("panda_ee_tip", "panda"))[0]
            world_dblock = float(np.linalg.norm(b1[:2] - b0[:2]))

            # -------- rollout-kernel replay (the planner model) --------
            K = 8
            fr = FusedRollout(
                world.built, world.engine,
                cost_fn=obj.kernel_cost(world.built.scene), H=H, K=K,
                interpret=jax.default_backend() == "cpu",
                impulse_sweeps=cfg.mppi.rollout_sweeps,
                world_fidelity=cfg.mppi.rollout_fidelity == "world",
                # vis channel rides the BLOCK root: the planner model's
                # predicted block trajectory, directly comparable to the
                # world's (the cost trace conflates EE terms)
                vis_body=world.scene.body_offset[bi],
            )
            params_K = sample_model_params(world.built, world.engine, K, seed=0)
            params_K = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], x.shape), params_K)
            st_K = jax.tree.map(
                lambda x: jnp.broadcast_to(x[:1], (K,) + x.shape[1:]), state0)
            V = jnp.asarray(tape)[None].repeat(K, 0)
            costs, vis = fr.rollout(st_K, params_K, V)
            c = np.asarray(costs)[0]
            bv = np.asarray(vis, np.float64)[:, 0, :]      # (H, 3) block traj
            model_dblock = float(np.linalg.norm(bv[-1, :2] - b0[:2]))
            print(json.dumps({
                "phase": f"tape j{jdof} {sgn:+.0f}",
                "world_block_moved_m": round(world_dblock, 4),
                "model_block_moved_m": round(model_dblock, 4),
                "world_block": b1[:2].round(3).tolist(),
                "model_block": bv[-1, :2].round(3).tolist(),
                "world_ee": ee1.round(3).tolist(),
                "rollout_cost_t0": round(float(c[0]), 2),
                "rollout_cost_min": round(float(c.min()), 2),
                "rollout_cost_tH": round(float(c[-1]), 2),
            }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
