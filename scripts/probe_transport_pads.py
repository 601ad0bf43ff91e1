"""Bisect the r4 transport slip: run the grasp-transport scenario with a
configurable finger-pad collision offset (0.007 = r4 flush pads, 0.0 = r1-r3
centered pads) and init grip, WITHOUT editing the tree.

python scripts/probe_transport_pads.py --pad-offset 0.0 --grip 0.035
"""
import argparse
import re
import sys

import numpy as np

sys.path.insert(0, ".")
from mppiisaac_tpu.scene import robots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pad-offset", type=float, default=0.007)
    ap.add_argument("--grip", type=float, default=0.025)
    ap.add_argument("--sweep", type=float, default=1.2)
    args = ap.parse_args()

    orig_panda = robots.panda

    def patched(variant="bare", prefix="panda"):
        xml = orig_panda(variant, prefix)
        if variant == "gripper":
            xml2 = xml.replace('xyz="0 0.007', f'xyz="0 {args.pad_offset}')
            xml2 = xml2.replace('xyz="0 -0.007', f'xyz="0 -{args.pad_offset}')
            assert args.pad_offset == 0.007 or xml2 != xml, "patch missed"
            xml = xml2
        return xml

    robots.panda = patched
    # robot_urdf may hold its own reference; patch via the registry too
    import mppiisaac_tpu.scene.builder as builder_mod

    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.actor import ActorSpec
    from mppiisaac_tpu.scene.builder import SimConfig

    specs = [
        ActorSpec(
            type="robot", name="panda", urdf_file="panda_gripper", fixed=True,
            gravity=False, gripper_binarize=True, gripper_open_threshold=0.25,
            init_joint_pose=[0.0, 0, -0.94, 0, 0.0, 0, -2.8, 0, 0.0, 0,
                             1.8675, 0, 0.0, 0, args.grip, 0.0, args.grip, 0.0],
        ),
        ActorSpec(type="box", name="block", size=[0.04, 0.04, 0.04],
                  mass=0.001, friction=1.0,
                  init_ori=[0.0, 0.0, 0.3826834, 0.9238795],
                  init_pos=[0.5, 0.0, 0.5]),
    ]
    sim = Simulation(SimConfig(dt=0.04, substeps=2), specs, num_envs=1)
    # verify the patch took: report the pad geom y-centers
    pads = [g for gi, g in enumerate(sim.scene.geom_pos)
            if abs(sim.scene.geom_size[gi][1] - 0.007) < 1e-9]
    print(f"pad geom y-centers: {[round(float(p[1]), 4) for p in pads]}")

    sc = sim.scene
    ndof = sc.actors[0].ndof
    f1, f2 = ndof - 2, ndof - 1
    blk_body = sc.body_offset[1]

    sim.reset_to_initial_poses()
    ee0 = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
    sim.set_actor_position_by_name("block", ee0)

    u = np.zeros(9, np.float32)
    u[8] = -1.0
    sim.apply_robot_cmd(u)
    for i in range(10):
        sim.step()
    q = np.asarray(sim.state.q)[0]
    blk = np.asarray(sim.get_actor_position_by_name("block"))[0]
    ee = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
    print(f"capture: q=({q[f1]:.4f},{q[f2]:.4f}) |ee-blk|={np.linalg.norm(blk-ee):.4f}")

    u[0] = args.sweep
    sim.apply_robot_cmd(u)
    worst = 0.0
    for i in range(60):
        sim.step()
        ee = np.asarray(sim.view.link_position("panda_ee", "panda"))[0]
        blk = np.asarray(sim.get_actor_position_by_name("block"))[0]
        q = np.asarray(sim.state.q)[0]
        d = float(np.linalg.norm(blk - ee))
        worst = max(worst, d)
        if i % 5 == 0 or d > 0.08:
            print(f"  t{i}: q=({q[f1]:.4f},{q[f2]:.4f}) |ee-blk|={d:.4f}")
        if d > 0.2:
            print("LOST")
            break
    print(f"RESULT pad_offset={args.pad_offset} grip={args.grip}: "
          f"{'FAIL' if worst > 0.08 else 'PASS'} worst={worst:.4f}")


if __name__ == "__main__":
    main()
