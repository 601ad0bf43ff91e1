"""Ablate solver features on the grasp-transport scenario (HEAD geometry):
  --no-warm     disable lam warm start in impulse_contact_pass
  --no-snap     disable the stiction snap (psi couple block)
  --iters N     impulse iterations
python scripts/probe_transport_ablate.py --no-warm
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--grip", type=float, default=0.025)
    ap.add_argument("--sweep", type=float, default=1.2)
    args = ap.parse_args()

    import mppiisaac_tpu.physics.contact as C

    orig = C.impulse_contact_pass

    if args.no_warm or args.iters is not None:
        def patched(scene, tables, cgeom, *a, **k):
            if args.no_warm:
                k["lam_warm"] = None
            if args.iters is not None:
                k["iters"] = args.iters
            return orig(scene, tables, cgeom, *a, **k)

        C.impulse_contact_pass = patched

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
    sc = sim.scene
    ndof = sc.actors[0].ndof
    f1, f2 = ndof - 2, ndof - 1

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
    print(f"RESULT no_warm={args.no_warm} iters={args.iters}: "
          f"{'FAIL' if worst > 0.08 else 'PASS'} worst={worst:.4f}")


if __name__ == "__main__":
    main()
