"""Replay the omni squeeze from the captured straddle state on CPU with
per-step (and first-steps per-substep) block kinematics, to find the exact
step where the block is ejected and the kick magnitude.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/diag_omni_squeeze.py
Requires /tmp/omni_straddle.npz (written by probe_omni_lift.py phase A).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STATE = "/tmp/omni_straddle.npz"


def main():
    import jax

    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", [])
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    data = np.load(STATE)
    leaves = [data[k] for k in data.files]
    _, treedef = jax.tree.flatten(world.state)
    world.state = jax.tree.unflatten(treedef, leaves)

    scene = world.built.scene
    bi = scene.actor_index("block")
    bbody = scene.body_offset[bi]
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

    def rep(t):
        st = world.state
        bp = np.asarray(st.body_pos[0, bbody])
        bv = np.asarray(st.body_vel[0, bbody]) if hasattr(st, "body_vel") else None
        q = np.asarray(st.q[0])
        qd = np.asarray(st.qd[0])
        fl = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
        fr = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
        vstr = f" bv=({bv[0]:+.2f},{bv[1]:+.2f},{bv[2]:+.2f})" if bv is not None else ""
        print(f"t={t:3d} blk=({bp[0]:+.3f},{bp[1]:+.3f},{bp[2]:+.3f}){vstr}"
              f" grip=({q[-2]:+.4f},{q[-1]:+.4f}) gripd=({qd[-2]:+.2f},{qd[-1]:+.2f})"
              f" f1=({fl[0]:+.3f},{fl[1]:+.3f},{fl[2]:+.3f})"
              f" f2=({fr[0]:+.3f},{fr[1]:+.3f},{fr[2]:+.3f})", flush=True)

    print("state fields:", [f for f in world.state.__dict__] if hasattr(world.state, "__dict__")
          else type(world.state), flush=True)
    rep(0)
    for t in range(1, 25):
        world.apply_robot_cmd(pd_hold()[None])
        world.step()
        rep(t)


if __name__ == "__main__":
    main()
