"""Minimal repro for the omni grasp-contact blowup (r4): teleport the
omnipanda to a near-grasp configuration (hand over the block, fingers at the
block's top face, slightly yawed so the fingertips PRESS the block instead of
straddling it), then step the WORLD engine with zero efforts and watch the
base velocity. A passive system in contact must settle; if |base qd| grows,
the contact path injects energy — the candidate root cause for omni's
hover-at-0.14 (MPPI avoids a violently repulsive region).

Usage: python scripts/probe_omni_contact.py [dz] [yaw]
  dz: hand height above block center (default 0.10 → fingertips pressing)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(dz=0.10, yaw=0.3):
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config
    from scripts.diag_omni_scripted import solve_ik

    cfg = load_config("tasks/omni_panda_pick", None)
    world = Simulation(cfg.isaacgym, cfg.actors, cfg.initial_actor_positions,
                       num_envs=1)
    scene = world.built.scene
    ai = scene.actor_index("omnipanda")
    art = scene.actors[ai]
    sl = scene.actor_dof_slice("omnipanda")
    hand_b = scene.body_index("panda_hand", "omnipanda")
    for _ in range(25):
        world.step()
    block = np.asarray(world.state.root_pos[0, scene.actor_index("block")])
    root_pos = np.asarray(world.state.root_pos[0, ai])
    root_quat = np.asarray(world.state.root_quat[0, ai])
    comfy = np.asarray([-1.57, -0.94, 0.0, -2.8, 0.0, 1.8675, 0.75])
    q_now = np.asarray(world.state.q[0, sl])
    tgt = block + np.array([0, 0, float(dz)])
    q_ik, err = solve_ik(art, root_pos, root_quat, q_now, tgt, comfy)
    print(f"IK err {err:.4f} q_ik base={q_ik[:3]}")

    # teleport: set the full dof state (positions = IK + yaw offset, vel 0)
    q_full = np.asarray(world.state.q[0]).copy()
    q_full[sl] = np.concatenate([q_ik, [0.02, 0.02]])
    q_full[scene.dof_offset[ai] + 2] += float(yaw)      # mis-align the gripper
    dof_state = np.zeros((scene.ndof, 2), np.float32)
    dof_state[:, 0] = q_full
    world.set_dof_state(dof_state[None])

    u = np.zeros(12, np.float32)
    for t in range(60):
        world.apply_robot_cmd(u)
        world.step()
        if t % 5 == 4:
            q = np.asarray(world.state.q[0, sl])
            qd = np.asarray(world.state.qd[0, sl])
            hand = np.asarray(world.state.body_pos[0, hand_b])
            blk = np.asarray(world.state.root_pos[0, scene.actor_index("block")])
            blkv = np.asarray(world.state.root_linvel[0, scene.actor_index("block")])
            ncf = np.asarray(world.state.net_contact_force[0])
            big = np.argsort(-np.linalg.norm(ncf, axis=1))[:3]
            print(
                f"t={t:3d} base_q=({q[0]:+.3f},{q[1]:+.3f},{q[2]:+.3f}) "
                f"base_qd=({qd[0]:+.3f},{qd[1]:+.3f},{qd[2]:+.3f}) "
                f"|qd_arm|={np.linalg.norm(qd[3:10]):.3f} "
                f"hand_z={hand[2]:.3f} blk=({blk[0]:+.3f},{blk[1]:+.3f},{blk[2]:+.3f}) "
                f"|blkv|={np.linalg.norm(blkv):.2f} "
                f"top_cf={[(int(b), round(float(np.linalg.norm(ncf[b])),1)) for b in big]}",
                flush=True,
            )


if __name__ == "__main__":
    main(*(float(a) for a in sys.argv[1:]))
