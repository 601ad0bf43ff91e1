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


_IK_CACHE = {}


def _ik_solver(art, root_pos, root_quat, comfy_arm, iters):
    """One jitted Adam-on-FK solve, (q0, target) as ARGUMENTS so a single
    compile serves every waypoint (1-core host: each XLA:CPU compile of the
    FK+grad graph costs ~1 min)."""
    from mppiisaac_tpu.physics.kinematics import fk_actor
    from mppiisaac_tpu.physics.math3d import quat_rotate

    hand = art.link_names.index("panda_hand")
    nq = art.ndof
    zeros = jnp.zeros(nq, jnp.float32)
    lo = jnp.asarray(art.dof_lower, jnp.float32)
    hi = jnp.asarray(art.dof_upper, jnp.float32)

    def loss(q10, target):
        q = zeros.at[:10].set(q10)
        pos, quat, _, _ = fk_actor(art, root_pos, root_quat, zeros[:3], zeros[:3], q, zeros)
        zaxis = quat_rotate(quat[hand], jnp.asarray([0.0, 0.0, 1.0]))
        return (
            jnp.sum((pos[hand] - target) ** 2) * 50.0
            + jnp.sum((zaxis - jnp.asarray([0.0, 0.0, -1.0])) ** 2) * 5.0
            + 0.02 * jnp.sum((q10[3:] - comfy_arm) ** 2)
            + jnp.sum(jnp.maximum(q10 - hi[:10], 0.0) ** 2) * 100.0
            + jnp.sum(jnp.maximum(lo[:10] - q10, 0.0) ** 2) * 100.0
        ), (pos[hand],)

    import optax

    opt = optax.adam(0.03)
    vg = jax.value_and_grad(loss, has_aux=True)

    @jax.jit
    def solve(q0, target):
        def body(carry, _):
            q10, ost = carry
            (v, aux), gr = vg(q10, target)
            upd, ost = opt.update(gr, ost)
            return (q10 + upd, ost), None

        (qf, _), _ = jax.lax.scan(body, (q0, opt.init(q0)), None, length=iters)
        (_, (hp,)), _ = vg(qf, target)
        return qf, hp

    return solve


def solve_ik(art, root_pos, root_quat, q0, target, comfy_arm, iters=600):
    """Gradient IK over the 10 actuated base+arm dofs: hand origin at
    `target`, hand z-axis pointing down (ee_tip below hand origin)."""
    key = id(art)
    if key not in _IK_CACHE:
        _IK_CACHE[key] = _ik_solver(art, root_pos, root_quat,
                                    jnp.asarray(comfy_arm), iters)
    qf, hp = _IK_CACHE[key](jnp.asarray(q0[:10], jnp.float32),
                            jnp.asarray(target, jnp.float32))
    err = float(jnp.linalg.norm(hp - jnp.asarray(target)))
    return np.asarray(qf), err


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
    for ph, (T, qstar, fu) in enumerate(phases):
        for t in range(T):
            q = np.asarray(world.state.q[0, sl])
            qd = np.asarray(world.state.qd[0, sl])
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
                    f"ph{ph} step {step:4d} hand=({hand[0]:+.3f},{hand[1]:+.3f},{hand[2]:+.3f}) "
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
