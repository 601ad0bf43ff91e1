"""Omni squeeze from the INIT arm pose (hand vertical?) vs the captured
planner-stall pose (hand tilted ~26 deg). Discriminates hand-tilt vs
finger-pad-geometry as the squeeze-instability cause.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/diag_omni_squeeze2.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    beta = os.environ.get("BETA")
    if beta:
        import mppiisaac_tpu.physics.stacked as stk

        stk.DAMP_CAP_BETA = float(beta)
        print(f"DAMP_CAP_BETA={stk.DAMP_CAP_BETA}")
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", [])
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)

    # settle one step so FK state is fresh
    world.apply_robot_cmd(np.zeros((1, world.nu), np.float32))
    world.step()

    hand = np.asarray(world.get_actor_link_by_name("panda_hand", "omnipanda"))[0]
    f1 = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
    f2 = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
    print(f"init hand={hand} f1={f1} f2={f2}")
    print(f"finger dz={f1[2]-f2[2]:+.4f} (0 = closing axis horizontal)")

    # open fingers to 0.038 and park the block at the grasp center
    ds = np.asarray(world.state.dof_state[0]).copy()
    ds[-2:, 0] = 0.038
    ds[:, 1] = 0.0
    world.set_dof_state(ds)
    world.apply_robot_cmd(np.zeros((1, world.nu), np.float32))
    # refresh finger positions at the open grip
    f1 = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
    f2 = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
    mid = 0.5 * (f1 + f2)
    bpos = np.array([mid[0], mid[1], mid[2] - 0.045], np.float32)
    world.set_actor_position_by_name("block", bpos)
    print(f"open f1={f1} f2={f2} -> block at {bpos}")

    nu = world.nu
    q_hold = np.asarray(world.state.q[0]).copy()

    def pd_hold():
        q = np.asarray(world.state.q[0])
        qd = np.asarray(world.state.qd[0])
        u = np.zeros(nu, np.float32)
        u[0:3] = np.clip(-200.0 * (q[0:3] - q_hold[0:3]) - 60.0 * qd[0:3], -80, 80)
        u[3:10] = np.clip(-60.0 * (q[3:10] - q_hold[3:10]) - 8.0 * qd[3:10], -20, 20)
        u[-2:] = -6.0
        return u

    gd_hist = []
    for t in range(40):
        world.apply_robot_cmd(pd_hold()[None])
        world.step()
        q = np.asarray(world.state.q[0])
        qd = np.asarray(world.state.qd[0])
        bp = np.asarray(world.get_actor_position_by_name("block"))[0]
        gd_hist.append(max(abs(qd[-2]), abs(qd[-1])))
        if t < 8 or t % 5 == 0 or t == 39:
            print(f"t={t:2d} grip=({q[-2]:+.4f},{q[-1]:+.4f}) gripd=({qd[-2]:+.3f},{qd[-1]:+.3f})"
                  f" blk=({bp[0]:+.3f},{bp[1]:+.3f},{bp[2]:+.3f})"
                  f" |b-b0|={np.linalg.norm(bp-bpos):.3f}", flush=True)
    held = np.linalg.norm(bp - bpos) < 0.05
    stalled = q[-2] > 0.012 and q[-1] > 0.012
    settled = float(np.mean(gd_hist[-10:]))
    print(f"init-pose squeeze: held={held} stalled={stalled}"
          f" settled_gripd={settled:.4f} (want < 0.02)")


if __name__ == "__main__":
    main()
