"""omni_panda_pick PHYSICS-vs-SOLVER discrimination (round-4 verdict item 1).

Drives the omnipanda through a hand-scripted pick with a PD controller in
effort space (the task's control mode): approach → descend → close → lift →
carry. If the WORLD engine (XLA path, 1 env) completes the pick under this
perfect-information policy, the physics supports the task and the 0/5 failure
is solver/model-side; if the grasp slips or the fingers can't straddle the
block, the physics (or geometry) is the blocker and no solver tuning can fix
it. Reference task: examples/omni_panda_pick/{planner,world}.py, success
‖block−goal‖ < 0.2 (world.py:66-75).

Usage: python scripts/diag_omni_scripted.py [grasp_dz] [n_steps] [--fused]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# default CPU: this is a 1-env diagnostic; JAX_PLATFORMS is ignored by the
# axon plugin, only the config flag works. DIAG_TPU=1 opts into the tunnel.
if os.environ.get("DIAG_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _np_qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def _np_qrot(q, v):
    u, w = q[:3], q[3]
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def _np_fk_hand(art, root_pos, root_quat, q, hand_idx):
    """numpy FK (positions+quats only) mirroring physics.kinematics — NO jax
    compile: the jitted Adam-IK's FK+grad graph took >28 min to compile on
    this 1-core host (r4: the original diag timed out inside that compile)."""
    from mppiisaac_tpu.physics.model import JOINT_PRISMATIC, JOINT_REVOLUTE

    nb = art.nbody
    pos = [None] * nb
    quat = [None] * nb
    for i in range(nb):
        if art.parent[i] < 0:
            pos[i] = np.asarray(root_pos, np.float64)
            quat[i] = np.asarray(root_quat, np.float64)
            continue
        p = int(art.parent[i])
        fpos = pos[p] + _np_qrot(quat[p], np.asarray(art.jpos[i], np.float64))
        fq = _np_qmul(quat[p], np.asarray(art.jquat[i], np.float64))
        jt = int(art.jtype[i])
        ax = np.asarray(art.jaxis[i], np.float64)
        if jt == JOINT_REVOLUTE:
            k = int(art.dof_index[i])
            half = 0.5 * q[k]
            rq = np.array([*(ax * np.sin(half)), np.cos(half)])
            pos[i], quat[i] = fpos, _np_qmul(fq, rq)
        elif jt == JOINT_PRISMATIC:
            k = int(art.dof_index[i])
            pos[i] = fpos + _np_qrot(fq, ax) * q[k]
            quat[i] = fq
        else:
            pos[i], quat[i] = fpos, fq
        if i == hand_idx:
            return pos[i], quat[i]
    return pos[hand_idx], quat[hand_idx]


def solve_ik(art, root_pos, root_quat, q0, target, comfy_arm, iters=200):
    """Damped-least-squares IK (finite-difference jacobian, pure numpy) over
    the 10 actuated base+arm dofs: hand origin at `target`, hand z-axis
    pointing down (ee_tip below hand origin)."""
    hand = art.link_names.index("panda_hand")
    nq = art.ndof
    lo = np.asarray(art.dof_lower, np.float64)[:10]
    hi = np.asarray(art.dof_upper, np.float64)[:10]
    rp = np.asarray(root_pos, np.float64)
    rq = np.asarray(root_quat, np.float64)
    down = np.array([0.0, 0.0, -1.0])

    def err6(q10):
        q = np.zeros(nq)
        q[:10] = q10
        hp, hq = _np_fk_hand(art, rp, rq, q, hand)
        z = _np_qrot(hq, np.array([0.0, 0.0, 1.0]))
        return np.concatenate([target - hp, 0.3 * (down - z)]), hp

    q10 = np.asarray(q0[:10], np.float64).copy()
    eps = 1e-5
    hp = None
    for _ in range(iters):
        e, hp = err6(q10)
        if np.linalg.norm(e[:3]) < 5e-4:
            break
        J = np.zeros((6, 10))
        for j in range(10):
            qp = q10.copy()
            qp[j] += eps
            ep, _ = err6(qp)
            J[:, j] = (e - ep) / eps          # J = -d(err)/dq = d(fk-ish)/dq
        # DLS step: e + (derr/dq)dq = 0 with derr/dq = -J  →  dq = J⁻¹e
        dq = np.linalg.solve(J.T @ J + 0.01 * np.eye(10), J.T @ e)
        q10 = np.clip(q10 + 0.5 * dq, lo, hi)
        q10[3:] += 0.02 * (np.asarray(comfy_arm) - q10[3:]) * 0.1
        q10 = np.clip(q10, lo, hi)
    e, hp = err6(q10)
    return q10.astype(np.float32), float(np.linalg.norm(e[:3]))


def main(grasp_dz=0.09, n_steps=280, use_fused=False):
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", None)
    world = Simulation(cfg.isaacgym, cfg.actors, cfg.initial_actor_positions,
                       num_envs=1)
    scene = world.built.scene
    ai = scene.actor_index("omnipanda")
    art = scene.actors[ai]
    hand_b = scene.body_index("panda_hand", "omnipanda")
    dt = cfg.isaacgym.dt

    root_pos = jnp.asarray(world.state.root_pos[0, ai])
    root_quat = jnp.asarray(world.state.root_quat[0, ai])
    comfy = jnp.asarray([-1.57, -0.94, 0.0, -2.8, 0.0, 1.8675, 0.75], jnp.float32)

    block0 = np.asarray(world.state.root_pos[0, scene.actor_index("block")])
    goal = np.asarray(world.state.root_pos[0, scene.actor_index("goal")])
    print(f"block0={block0} goal={goal} root={np.asarray(root_pos)}")

    # let the block settle onto the table first (it spawns at z=1)
    for _ in range(25):
        world.step()
    block = np.asarray(world.state.root_pos[0, scene.actor_index("block")])
    print(f"block settled at {block}")

    q_now = np.asarray(world.state.q[0, scene.actor_dof_slice("omnipanda")])
    tgt_pre = jnp.asarray(block + np.array([0, 0, grasp_dz + 0.12]), jnp.float32)
    tgt_grasp = jnp.asarray(block + np.array([0, 0, grasp_dz]), jnp.float32)
    tgt_lift = jnp.asarray(block + np.array([0, 0, grasp_dz + 0.30]), jnp.float32)
    tgt_carry = jnp.asarray(goal + np.array([0, 0, grasp_dz + 0.02]), jnp.float32)

    q_pre, e1 = solve_ik(art, root_pos, root_quat, q_now, tgt_pre, comfy)
    q_grasp, e2 = solve_ik(art, root_pos, root_quat, q_pre, tgt_grasp, comfy)
    q_lift, e3 = solve_ik(art, root_pos, root_quat, q_grasp, tgt_lift, comfy)
    q_carry, e4 = solve_ik(art, root_pos, root_quat, q_lift, tgt_carry, comfy)
    print(f"IK errors: pre={e1:.4f} grasp={e2:.4f} lift={e3:.4f} carry={e4:.4f}")
    np.set_printoptions(precision=3, suppress=True)
    print(f"q_now base={q_now[:3]} q_pre={q_pre}")
    print(f"q_grasp={q_grasp}")
    print(f"q_carry base={q_carry[:3]}")

    # effort-space PD gains (clip at solver bounds ±80 base / ±87,±12 arm)
    KP = np.array([300, 300, 100] + [150, 150, 150, 150, 30, 30, 30], np.float64)
    KD = np.array([120, 120, 40] + [25, 25, 25, 25, 5, 5, 5], np.float64)
    U_LO = np.array([-80, -80, -80, -87, -87, -87, -87, -12, -12, -12], np.float64)
    U_HI = -U_LO

    phases = [
        (int(2.4 / dt), q_pre, +3.0),     # approach, fingers opening
        (int(1.6 / dt), q_grasp, +3.0),   # descend, fingers open
        (int(0.8 / dt), q_grasp, -6.0),   # close
        (int(1.6 / dt), q_lift, -6.0),    # lift
        (int(6.0 / dt), q_carry, -6.0),   # carry to goal
    ]

    sl = scene.actor_dof_slice("omnipanda")
    step = 0
    success_step = None
    for ph, (T, qgoal, fu) in enumerate(phases):
        q_start = np.asarray(world.state.q[0, sl])[:10].copy()
        for t in range(T):
            q = np.asarray(world.state.q[0, sl])
            qd = np.asarray(world.state.qd[0, sl])
            # ramped joint-space target: a step target the size of the IK
            # jump saturates every effort channel and the arm's reaction
            # whip overwhelms the base's ±80 N authority (r4 diag: base ran
            # +8 m against a constant −80 N command)
            alpha = min(1.0, (t + 1) / max(int(0.7 * T), 1))
            qstar = q_start + alpha * (np.asarray(qgoal) - q_start)
            u10 = np.clip(KP * (qstar - q[:10]) - KD * qd[:10], U_LO, U_HI)
            u = np.concatenate([u10, [fu, fu]]).astype(np.float32)
            world.apply_robot_cmd(u)
            world.step()
            step += 1
            if step % 20 == 0 or t == T - 1:
                hand = np.asarray(world.state.body_pos[0, hand_b])
                blk = np.asarray(world.state.root_pos[0, scene.actor_index("block")])
                grip = q[-2:]
                print(
                    f"ph{ph} step {step:4d} "
                    f"base=({q[0]:+.2f},{q[1]:+.2f},{q[2]:+.2f})->"
                    f"({qstar[0]:+.2f},{qstar[1]:+.2f},{qstar[2]:+.2f}) "
                    f"u=({u10[0]:+.0f},{u10[1]:+.0f}) "
                    f"hand=({hand[0]:+.3f},{hand[1]:+.3f},{hand[2]:+.3f}) "
                    f"block=({blk[0]:+.3f},{blk[1]:+.3f},{blk[2]:+.3f}) "
                    f"|h-b|={np.linalg.norm(hand - blk):.3f} "
                    f"|b-g|={np.linalg.norm(blk - goal):.3f} grip=({grip[0]:.3f},{grip[1]:.3f})",
                    flush=True,
                )
            blk = np.asarray(world.state.root_pos[0, scene.actor_index("block")])
            if np.linalg.norm(blk - goal) < 0.2 and success_step is None:
                success_step = step
                print(f"SUCCESS at step {step}")
                return True
    print(f"FAILED (no success in {step} steps)")
    return False


if __name__ == "__main__":
    dz = float(sys.argv[1]) if len(sys.argv) > 1 else 0.09
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 280
    main(dz, n)
