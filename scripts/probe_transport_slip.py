"""Diagnose the r4 grasp-transport slip (VERDICT r5 item 1).

Reproduces tests/test_grasp_transport.py and logs, per sweep step:
  - finger joint positions q1,q2 (pad gap = q1+q2 with flush pads)
  - block position in the HAND frame (slip direction)
  - |ee-blk| separation
  - net contact force on the block
Run: python scripts/probe_transport_slip.py [--pads centered|flush]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig
from mppiisaac_tpu.physics.math3d import quat_rotate, quat_conjugate
import jax.numpy as jnp


def specs(init_grip):
    return [
        ActorSpec(
            type="robot", name="panda", urdf_file="panda_gripper", fixed=True,
            gravity=False, gripper_binarize=True, gripper_open_threshold=0.25,
            init_joint_pose=[0.0, 0, -0.94, 0, 0.0, 0, -2.8, 0, 0.0, 0,
                             1.8675, 0, 0.0, 0, init_grip, 0.0, init_grip, 0.0],
        ),
        ActorSpec(type="box", name="block", size=[0.04, 0.04, 0.04],
                  mass=0.001, friction=1.0,
                  init_ori=[0.0, 0.0, 0.3826834, 0.9238795],
                  init_pos=[0.5, 0.0, 0.5]),
    ]


def hand_frame(sim, p):
    """world point -> hand frame"""
    hi = sim.scene.body_index("panda_hand", "panda")
    hp = np.asarray(sim.state.body_pos)[0, hi]
    hq = np.asarray(sim.state.body_quat)[0, hi]
    return np.asarray(quat_rotate(quat_conjugate(jnp.asarray(hq)), jnp.asarray(p - hp)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grip", type=float, default=0.025)
    ap.add_argument("--sweep", type=float, default=1.2)
    args = ap.parse_args()

    sim = Simulation(SimConfig(dt=0.04, substeps=2), specs(args.grip), num_envs=1)
    sc = sim.scene
    dof_off = sc.dof_offset[0]
    # finger dofs are the last two of the panda actor
    ndof = sc.actors[0].ndof
    f1, f2 = dof_off + ndof - 2, dof_off + ndof - 1
    bi = sc.body_index("block", None) if "block" in [a.name for a in sim.built.specs] else None
    blk_body = sc.body_offset[1]

    sim.reset_to_initial_poses()
    ee0 = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
    sim.set_actor_position_by_name("block", ee0)

    u = np.zeros(9, np.float32)
    u[8] = -1.0
    sim.apply_robot_cmd(u)
    print("== capture ==")
    for i in range(10):
        sim.step()
        q = np.asarray(sim.state.q)[0]
        blk = np.asarray(sim.get_actor_position_by_name("block"))[0]
        ee = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
        cf = np.asarray(sim.state.net_contact_force)[0, blk_body]
        bh = hand_frame(sim, blk)
        print(f"  t{i}: q=({q[f1]:.4f},{q[f2]:.4f}) gap={q[f1]+q[f2]:.4f} "
              f"|ee-blk|={np.linalg.norm(blk-ee):.4f} blk_hand=({bh[0]:+.3f},{bh[1]:+.3f},{bh[2]:+.3f}) "
              f"cf=({cf[0]:+.2f},{cf[1]:+.2f},{cf[2]:+.2f})")

    print("== sweep ==")
    u[0] = args.sweep
    sim.apply_robot_cmd(u)
    prev = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
    for i in range(60):
        sim.step()
        ee = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
        blk = np.asarray(sim.get_actor_position_by_name("block"))[0]
        q = np.asarray(sim.state.q)[0]
        cf = np.asarray(sim.state.net_contact_force)[0, blk_body]
        bh = hand_frame(sim, blk)
        d = np.linalg.norm(blk - ee)
        bv = np.asarray(sim.state.root_linvel)[0, 1]
        flag = " <-- SEP" if d > 0.08 else ""
        print(f"  t{i}: q=({q[f1]:.4f},{q[f2]:.4f}) |ee-blk|={d:.4f} "
              f"blk_hand=({bh[0]:+.3f},{bh[1]:+.3f},{bh[2]:+.3f}) "
              f"cf=({cf[0]:+.1f},{cf[1]:+.1f},{cf[2]:+.1f}) |bv|={np.linalg.norm(bv):.3f}{flag}")
        if d > 0.2:
            break
        prev = ee


if __name__ == "__main__":
    main()
