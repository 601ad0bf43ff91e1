"""Which cost term vetoes the grasp? From the planner's stall state, teleport
the block to the grasp center (as diag_omni_teleport does), then compare two
scripted 40-step continuations in the WORLD engine (parity-tested vs the
rollout model): (a) hover with zero commands, (b) squeeze -6 N. Print the
omni objective's per-term costs each step.

Usage: python scripts/diag_omni_cost.py [stall_steps] [seed]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STATE = "/tmp/omni_straddle.npz"


def terms(obj, view):
    import jax.numpy as jnp

    from mppiisaac_tpu.tasks.common import contact_force_mag, ee_upright_cost, norm

    r = view.link_state("panda_hand", "omnipanda")
    block = view.actor_position("block")
    goal = view.actor_position("goal")
    q = view.actor_q("omnipanda")
    qd = view.actor_qd("omnipanda")
    w = obj.weights
    out = {
        "r2b": w["robot_to_block"] * norm(r[..., 0:3] - block),
        "b2g": w["block_to_goal"] * norm(block - goal),
        "col": w["collision"] * contact_force_mag(view, "table"),
        "ori": w["robot_ori"] * ee_upright_cost(r[..., 3:7]),
        "bvel": w["base_vel"] * jnp.sum(qd[..., 0:3] ** 2, axis=-1),
        "avel": w["arm_vel"] * jnp.sum(qd[..., 3:10] ** 2, axis=-1),
        "comfy": w["comfy_arm_pose"] * jnp.sum(
            (q[..., 3:10] - obj.comfy_arm_pose) ** 2, axis=-1),
        "grip": w["comfy_gripper_state"] * jnp.sum(
            (q[..., -2:] - obj.comfy_gripper_state) ** 2, axis=-1),
        "height": w["height_cost"] * jnp.maximum(0.12 - r[..., 2], 0.0),
    }
    return {k: float(np.asarray(v)[0]) for k, v in out.items()}


def main():
    import jax

    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", [])
    obj = OmniPandaPickObjective(cfg)
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    if not os.path.exists(STATE):
        print("need /tmp/omni_straddle.npz (run probe_omni_lift.py first)")
        return
    data = np.load(STATE)
    leaves = [data[k] for k in data.files]
    _, treedef = jax.tree.flatten(world.state)
    state0 = jax.tree.unflatten(treedef, leaves)

    nu = world.nu

    def episode(tag, grip_u):
        world.state = state0
        q_hold = np.asarray(world.state.q[0]).copy()
        tot0 = None
        for t in range(40):
            q = np.asarray(world.state.q[0])
            qd = np.asarray(world.state.qd[0])
            u = np.zeros(nu, np.float32)
            u[0:3] = np.clip(-200.0 * (q[0:3] - q_hold[0:3]) - 60.0 * qd[0:3], -80, 80)
            u[3:10] = np.clip(-60.0 * (q[3:10] - q_hold[3:10]) - 8.0 * qd[3:10], -20, 20)
            u[-2:] = grip_u
            world.apply_robot_cmd(u[None])
            world.step()
            tt = terms(obj, world.view)
            tot = sum(tt.values())
            if tot0 is None:
                tot0 = tot
            if t < 6 or t % 10 == 0 or t == 39:
                s = " ".join(f"{k}={v:7.3f}" for k, v in tt.items())
                print(f"[{tag}] t={t:2d} total={tot:8.3f} {s}", flush=True)
        print(f"[{tag}] total t0={tot0:.3f} -> t39={tot:.3f}")

    episode("hover", 0.0)
    episode("squeeze", -6.0)


if __name__ == "__main__":
    main()
