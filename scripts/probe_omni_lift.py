"""omni_panda_pick WORLD-physics capability probe (round-4).

diag_omni_teleport showed the planner ejects the block even from a perfect
straddle. This probe asks the prior question: can the WORLD engine itself
execute grasp -> lift -> carry from that exact state under a SCRIPTED
effort-mode policy (fingers -6 N squeeze, arm tau = J^T F_up, base velocity
servo toward the goal)? If yes, the 0/5 is solver/rollout-side; if the block
slips or is ejected, the physics (finger stiction / couple contact) is the
gap.

Phase A (once): run the real planner 896 steps to the stall, teleport the
block to the grasp center, save the state to /tmp/omni_straddle.npz.
Phase B (fast, repeatable): load state, run the script on the 1-env world.

Usage: python scripts/probe_omni_lift.py [--fresh] [fz] [vy]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STATE = "/tmp/omni_straddle.npz"


def build():
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", [])
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    return cfg, world


def capture(cfg, world):
    import jax

    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.runtime.loop import _build_chunk
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective

    obj = OmniPandaPickObjective(cfg)
    planner = MPPIisaacPlanner(cfg, obj)
    chunk, _ = _build_chunk(cfg, world, planner, device_steps=16)
    step = 0
    while step < 896:
        planner.objective.reset()
        carry, wstate, _ = chunk(planner.mppi.carry, world.state)
        planner.mppi.carry = carry
        world.state = wstate
        step += 16
    fl = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
    fr = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
    mid = 0.5 * (fl + fr)
    world.set_actor_position_by_name(
        "block", np.array([mid[0], mid[1], max(0.292, mid[2] - 0.045)], np.float32))
    ds = np.asarray(world.state.dof_state[0]).copy()
    ds[-2:, 0] = 0.038
    ds[-2:, 1] = 0.0
    # also zero all robot dof velocities for a clean start
    ds[:, 1] = 0.0
    world.set_dof_state(ds)
    leaves = [np.asarray(l) for l in jax.tree.leaves(world.state)]
    np.savez(STATE, *leaves)
    print("captured straddle state ->", STATE, flush=True)


def restore(world):
    import jax

    data = np.load(STATE)
    leaves = [data[k] for k in data.files]
    _, treedef = jax.tree.flatten(world.state)
    world.state = jax.tree.unflatten(treedef, leaves)


def main():
    import jax.numpy as jnp

    from mppiisaac_tpu.physics.math3d import quat_rotate

    args = [a for a in sys.argv[1:] if a != "--fresh"]
    fz = float(args[0]) if args else 10.0
    vy_des = float(args[1]) if len(args) > 1 else 0.3

    cfg, world = build()
    if "--fresh" in sys.argv or not os.path.exists(STATE):
        capture(cfg, world)
    restore(world)

    scene = world.built.scene
    ai = scene.actor_index("omnipanda")
    art = scene.actors[ai]
    bo = scene.body_offset[ai]
    # arm joint columns (skip base x/y/theta = dofs 0..2, skip fingers)
    arm = [(int(art.dof_index[i]), bo + i, np.asarray(art.jaxis[i]), int(art.jtype[i]))
           for i in range(art.nbody)
           if art.dof_index[i] >= 3 and "finger" not in art.dof_names[int(art.dof_index[i])]]

    def arm_tau(F):
        st = world.state
        hand = np.asarray(world.get_actor_link_by_name("panda_hand", "omnipanda"))[0]
        tau = np.zeros(7, np.float32)
        for k, body, axis, jtype in sorted(arm):
            bq = np.asarray(st.body_quat[0, body])
            bp = np.asarray(st.body_pos[0, body])
            aw = np.asarray(quat_rotate(jnp.asarray(bq), jnp.asarray(axis, jnp.float32)))
            col = np.cross(aw, hand - bp) if jtype == 1 else aw
            tau[k - 3] = float(np.dot(col, F))
        return np.clip(tau, -20, 20)

    def report(tag, t):
        hand = np.asarray(world.get_actor_link_by_name("panda_hand", "omnipanda"))[0]
        block = np.asarray(world.get_actor_position_by_name("block"))[0]
        goal = np.asarray(world.get_actor_position_by_name("goal"))[0]
        q = np.asarray(world.state.q[0])
        qd = np.asarray(world.state.qd[0])
        print(f"[{tag}] t={t:4d} hand=({hand[0]:+.3f},{hand[1]:+.3f},{hand[2]:+.3f})"
              f" block=({block[0]:+.3f},{block[1]:+.3f},{block[2]:+.3f})"
              f" |h-b|={np.linalg.norm(hand-block):.3f} |b-g|={np.linalg.norm(block-goal):.3f}"
              f" grip=({q[-2]:.3f},{q[-1]:.3f}) base_vy={qd[1]:+.2f}", flush=True)

    nu = world.nu
    t = 0
    report("start", t)

    # effort mode gives RAW torques: zero arm effort = the arm free-falls
    # (r5: the original phases commanded zero arm torque, the arm collapsed
    # in 1.6 s and flung the block 2.8 m — the probe tested arm-collapse, not
    # grasping). Hold the captured arm pose with a PD in effort space, and
    # servo the base DOFs to stand still.
    q_hold = np.asarray(world.state.q[0]).copy()

    def pd_hold(F_extra=None):
        st = world.state
        q = np.asarray(st.q[0])
        qd = np.asarray(st.qd[0])
        u = np.zeros(nu, np.float32)
        # base x/y/yaw: damp to rest (effort bounds +-80 N)
        u[0:3] = np.clip(-200.0 * (q[0:3] - q_hold[0:3]) - 60.0 * qd[0:3], -80, 80)
        # arm: PD to the captured pose (bounds +-20 Nm)
        u[3:10] = np.clip(
            -60.0 * (q[3:10] - q_hold[3:10]) - 8.0 * qd[3:10], -20, 20
        )
        if F_extra is not None:
            u[3:10] = np.clip(u[3:10] + arm_tau(F_extra), -20, 20)
        u[-2:] = -6.0
        return u

    # phase 1: squeeze (fingers effort -6 N), PD-hold everything else
    for _ in range(40):
        world.apply_robot_cmd(pd_hold()[None])
        world.step()
        t += 1
    report("squeezed", t)
    # phase 2: lift — raise the arm PD setpoint of the shoulder/elbow toward
    # a lifted pose while keeping J^T Fz assist and the squeeze
    for _ in range(100):
        q_hold[3:10] += 0.002 * np.array([0.0, -1.0, 0.0, 1.0, 0.0, -0.5, 0.0])
        world.apply_robot_cmd(pd_hold(np.array([0.0, 0.0, fz]))[None])
        world.step()
        t += 1
        if t % 40 == 0:
            report("lift", t)
    report("lifted", t)
    # phase 3: carry — walk the base x/y setpoint toward the goal
    g = np.asarray(world.get_actor_position_by_name("goal"))[0]
    for _ in range(500):
        b2 = np.asarray(world.get_actor_position_by_name("block"))[0]
        d = g[:2] - q_hold[0:2]
        dn = np.linalg.norm(d)
        if dn > 1e-6:
            q_hold[0:2] += min(vy_des * 0.04, dn) * d / dn
        world.apply_robot_cmd(pd_hold(np.array([0.0, 0.0, fz]))[None])
        world.step()
        t += 1
        if t % 50 == 0:
            report("carry", t)
        b = np.asarray(world.get_actor_position_by_name("block"))[0]
        if np.linalg.norm(b - g) < 0.2:
            report("SUCCESS", t)
            return
    report("end", t)


if __name__ == "__main__":
    main()
