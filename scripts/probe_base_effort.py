"""Micro-probe: does a constant effort on the omnipanda's prismatic base dofs
accelerate the base in the commanded direction? Isolates the r4 scripted-pick
observation (base runs +y under u_y=-80) from arm-reaction coupling by
commanding ONE base dof at a time with the arm efforts zeroed."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", None)
    world = Simulation(cfg.isaacgym, cfg.actors, cfg.initial_actor_positions,
                       num_envs=1)
    scene = world.built.scene
    sl = scene.actor_dof_slice("omnipanda")

    for dof, val in ((1, -80.0), (1, +80.0), (0, -80.0), (2, -40.0)):
        world.reset_to_initial_poses()
        u = np.zeros(12, np.float32)
        u[dof] = val
        qs = []
        for t in range(30):
            world.apply_robot_cmd(u)
            world.step()
            q = np.asarray(world.state.q[0, sl])
            qs.append(q[dof])
        qd = np.asarray(world.state.qd[0, sl])
        print(f"dof {dof} effort {val:+.0f}: q {qs[0]:+.4f} -> {qs[9]:+.4f} -> "
              f"{qs[-1]:+.4f}  qd_end={qd[dof]:+.3f}", flush=True)


if __name__ == "__main__":
    main()
