"""Omni effort-mode grasp capability probe: squeeze -> lift -> carry with a
SUPPORTED block (the real task squeezes a block resting on the table).

This probe settled the r5 omni root-cause hunt. Findings (r5):
- raw constant-force effort fingers bang-bang at the +-0.2 m/s clamp and
  juggle/eject a caged block -> fixed with the implicit motor-curve drive
  (stacked.drive_terms_stacked finger_motor, tau = u - (|u|/v_max) qd+).
- two constant-force fingers + block have a free translation mode along the
  closing axis (drive forces cancel); sustained lateral load walks the grasp
  off the pads -> fixed with finger mechanism friction 2 N (robots.py).
- joint7=0 leaves the closing axis 45 deg to the block faces (the hand_joint
  bakes -pi/4): the pads pinch the cube's EDGES at its top corners only. The
  reference comfy pose joint7=0.75~pi/4 makes the grasp face-on; objectives
  drive the wrist there.
- a 25 Hz scripted arm PD hold resonates (hand sways laterally, growing) and
  ejects the block; at 100 Hz the same gains are stable. Planner commands are
  re-optimized each step, so this is a probe artifact, not task physics.

With those, squeeze (-6 N) holds a 0.1 kg 4 cm block indefinitely, a 2.4 s
lift raises it 15 cm with <1 mm grip drift, and a base carry translates it.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/diag_omni_squeeze3.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

J7 = float(os.environ.get("J7", "0.75"))
INIT_JP = [0.0, 0, 0.0, 0, 0.0, 0, 0.0, 0, -0.94, 0, 0.0, 0, -2.8, 0, 0.0, 0,
           1.8675, 0, J7, 0, 0.038, 0.0, 0.038, 0.0]


def build(pedestal_at=None, block_at=None):
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig

    specs = [
        ActorSpec(type="robot", name="omnipanda", urdf_file="omni_panda",
                  fixed=True, gravity=False, dof_mode="effort",
                  gripper_binarize=False, init_joint_pose=list(INIT_JP)),
    ]
    if pedestal_at is not None:
        specs.append(ActorSpec(type="box", name="pedestal", fixed=True,
                               size=[0.06, 0.06, float(2 * pedestal_at[2])],
                               friction=0.2,
                               init_pos=[float(v) for v in pedestal_at]))
        specs.append(ActorSpec(type="box", name="block", size=[0.04, 0.04, 0.04],
                               mass=0.1, friction=1.0,
                               init_pos=[float(v) for v in block_at]))
    # 100 Hz control == substep rate: the probe's fixed-gain PD hold is only
    # stable there (see module docstring); the planner runs 25 Hz fine.
    return Simulation(SimConfig(dt=0.01, substeps=1), specs, num_envs=1)


def main():
    world = build()
    world.apply_robot_cmd(np.zeros((1, world.nu), np.float32))
    world.step()
    f1 = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
    f2 = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
    mid = 0.5 * (f1 + f2)
    grasp = np.array([mid[0], mid[1], mid[2] - 0.045])
    ped_top = grasp[2] - 0.02
    world = build([grasp[0], grasp[1], ped_top / 2.0],
                  [grasp[0], grasp[1], ped_top + 0.0201])

    nu = world.nu
    q_hold = np.asarray(world.state.q[0]).copy()

    def pd():
        q = np.asarray(world.state.q[0])
        qd = np.asarray(world.state.qd[0])
        u = np.zeros(nu, np.float32)
        u[0:3] = np.clip(-200.0 * (q[0:3] - q_hold[0:3]) - 60.0 * qd[0:3], -80, 80)
        u[3:10] = np.clip(-60.0 * (q[3:10] - q_hold[3:10]) - 8.0 * qd[3:10], -20, 20)
        u[-2:] = -6.0
        return u

    b0 = np.asarray(world.get_actor_position_by_name("block"))[0].copy()

    for _ in range(100):                      # 1 s squeeze
        world.apply_robot_cmd(pd()[None])
        world.step()
    q = np.asarray(world.state.q[0])
    bp = np.asarray(world.get_actor_position_by_name("block"))[0]
    sq_ok = np.linalg.norm(bp - b0) < 0.02 and q[-2] > 0.012 and q[-1] > 0.012
    print(f"squeeze: ok={sq_ok} grip=({q[-2]:+.4f},{q[-1]:+.4f})"
          f" blk d={np.round(bp - b0, 4)}")

    for t in range(240):                      # 2.4 s lift
        q_hold[3:10] += 0.001 * np.array([0.0, -1.0, 0.0, 1.0, 0.0, -0.5, 0.0])
        world.apply_robot_cmd(pd()[None])
        world.step()
        if t % 80 == 0 or t == 239:
            q = np.asarray(world.state.q[0])
            bp = np.asarray(world.get_actor_position_by_name("block"))[0]
            hand = np.asarray(world.get_actor_link_by_name("panda_hand", "omnipanda"))[0]
            print(f"lift t={t:3d} hand_z={hand[2]:.3f} blk_z={bp[2]:.3f}"
                  f" grip=({q[-2]:+.4f},{q[-1]:+.4f})", flush=True)
    lift_ok = bp[2] > b0[2] + 0.10

    # carry: walk the base AWAY from the pedestal column (-x)
    for t in range(250):
        q_hold[0] -= 0.002
        world.apply_robot_cmd(pd()[None])
        world.step()
        if t % 80 == 0 or t == 249:
            q = np.asarray(world.state.q[0])
            bp = np.asarray(world.get_actor_position_by_name("block"))[0]
            print(f"carry t={t:3d} blk=({bp[0]:+.3f},{bp[1]:+.3f},{bp[2]:.3f})"
                  f" grip=({q[-2]:+.4f},{q[-1]:+.4f})", flush=True)
    bp = np.asarray(world.get_actor_position_by_name("block"))[0]
    carry_ok = bp[2] > b0[2] + 0.05 and bp[0] < b0[0] - 0.25
    print(f"lift_ok={lift_ok} carry_ok={carry_ok} final blk {np.round(bp, 3)}")
    print("PASS" if (sq_ok and lift_ok and carry_ok) else "FAIL")


if __name__ == "__main__":
    main()
