"""Minimal effort-mode squeeze repro: mini_gripper with dof_mode=effort,
-6 N on each finger, 0.1 kg 4 cm block between the pads.

Two variants: block mid-air at grasp center (the omni straddle state) and
block resting on a table under the gripper. A stable squeeze must stall the
fingers at the block faces (gap = block width) and hold the block; the
observed omni failure is finger chatter at the +-0.2 m/s velocity limit that
juggles/ejects the block.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/diag_squeeze_min.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(tag, with_table):
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig

    specs = [
        ActorSpec(type="robot", name="mini_gripper", fixed=True,
                  dof_mode="effort", gripper_binarize=False,
                  init_pos=[0.0, 0.0, 0.5]),
        ActorSpec(type="box", name="block", size=[0.04, 0.04, 0.04], mass=0.1,
                  init_pos=[0.0, 0.0, 0.53], friction=1.0),
    ]
    if with_table:
        specs.append(ActorSpec(type="box", name="table", fixed=True,
                               size=[0.3, 0.3, 0.4], friction=0.2,
                               init_pos=[0.0, 0.0, 0.31]))
    sim = Simulation(SimConfig(dt=0.04, substeps=2), specs, num_envs=1)
    ds = np.zeros((2, 2), np.float32)
    ds[:, 0] = 0.038
    sim.set_dof_state(ds)
    print(f"--- {tag}")
    u = np.array([-6.0, -6.0], np.float32)
    for t in range(30):
        sim.apply_robot_cmd(u)
        sim.step()
        q = np.asarray(sim.state.q[0])
        qd = np.asarray(sim.state.qd[0])
        bp = np.asarray(sim.get_actor_position_by_name("block"))[0]
        if t < 8 or t % 5 == 0 or t == 29:
            print(f"t={t:2d} grip=({q[0]:+.4f},{q[1]:+.4f}) gripd=({qd[0]:+.3f},{qd[1]:+.3f})"
                  f" blk=({bp[0]:+.3f},{bp[1]:+.3f},{bp[2]:+.3f})", flush=True)
    held = abs(bp[2] - 0.53) < 0.05 and abs(bp[0]) < 0.05 and abs(bp[1]) < 0.05
    stalled = q[0] > 0.012 and q[1] > 0.012
    print(f"{tag}: held={held} stalled={stalled} final grip=({q[0]:.4f},{q[1]:.4f})")
    return held and stalled


def main():
    # mid-air is informational: with the motor-curve finger model the block
    # correctly FREE-FALLS before the damped fingers arrive (the pre-r5-fix
    # "catch" was chatter juggling it). The supported squeeze is the verdict.
    run("mid-air squeeze (informational: block should fall)", with_table=False)
    ok_tab = run("on-table squeeze", with_table=True)
    print("PASS" if ok_tab else "FAIL")


if __name__ == "__main__":
    main()
