"""Push-regression diagnostic (round-3, verdict item 1).

Bisects the boxer_push failure into (a) world-physics vs (b) planner-model vs
(c) cost/solver, by replaying a SCRIPTED push policy (no MPPI) that provably
moves the block on the CPU/XLA world engine:

  world   — run the scripted P-controller in the task's real world sim (on TPU
            this is the FusedWorldStep path, exactly what the suite runs).
  rollout — replay the recorded control tape through the fused ROLLOUT kernel
            (the planner model) from the same initial state and compare the
            predicted block trajectory against the world's (VERDICT item 8's
            quantified parity, on the push scene).

Usage: python scripts/diag_push.py [n_steps]
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scripted_push(world, n_steps, goal, record=None):
    """P-controller: drive behind the block, push toward goal; returns
    per-step block positions (and appends (v,w) to `record`)."""
    import jax.numpy as jnp

    bi = world.scene.actor_index("block")
    traj = []
    for step in range(n_steps):
        b = np.asarray(world.state.root_pos[0, bi])[:2]
        r = np.asarray(world.state.root_pos[0, world.scene.actor_index("boxer")])[:2]
        d_bg = goal - b
        nd = np.linalg.norm(d_bg)
        if nd < 0.15:
            v, w = 0.0, 0.0
        else:
            d_bg = d_bg / (nd + 1e-9)
            target = b - 0.35 * d_bg
            to_t = target - r
            if np.linalg.norm(to_t) < 0.15:
                to_t = (b + 0.3 * d_bg) - r
            q = np.asarray(world.get_actor_orientation_by_name("boxer"))[0]
            qx, qy, qz, qw = q
            yaw = math.atan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
            des = math.atan2(to_t[1], to_t[0])
            err = (des - yaw + math.pi) % (2 * math.pi) - math.pi
            v = 0.8 if abs(err) < 0.6 else 0.1
            w = float(np.clip(2.0 * err, -3, 3))
        if record is not None:
            record.append((v, w))
        world.apply_robot_cmd(jnp.asarray([[v, w]]))
        world.step()
        traj.append(np.asarray(world.state.root_pos[0, bi]).copy())
    return np.asarray(traj)


def main(n_steps=150):
    import jax
    import jax.numpy as jnp

    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/boxer_push", None)
    goal = np.asarray(cfg.goal, np.float64)[:2]

    # ---- 1) the WORLD path the suite actually runs (fused on TPU) ----
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    state0 = world.state
    controls = []
    traj_w = scripted_push(world, n_steps, goal, record=controls)
    d_final = float(np.linalg.norm(traj_w[-1][:2] - goal))
    print(json.dumps({
        "phase": "world", "fused_world": world._fused_world is not None,
        "block_final": traj_w[-1].tolist(), "dist_to_goal": round(d_final, 3),
        "reached": d_final < 0.2,
    }), flush=True)

    # ---- 2) the PLANNER MODEL: fused rollout kernel replays the same tape ----
    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
    from mppiisaac_tpu.runtime.sim import sample_model_params
    from mppiisaac_tpu.tasks.mobile_push import MobilePushObjective

    H = min(n_steps, 60)
    K = 8
    obj = MobilePushObjective(cfg, "boxer", "ee_link")
    for fidelity, sweeps, substeps in (("world", cfg.mppi.rollout_sweeps, None),
                                       ("fast", cfg.mppi.rollout_sweeps, None)):
        fr = FusedRollout(
            world.built, world.engine, cost_fn=obj.kernel_cost(world.built.scene),
            H=H, K=K, interpret=jax.default_backend() == "cpu",
            impulse_sweeps=sweeps, world_fidelity=fidelity == "world",
            substeps=substeps,
        )
        params_K = sample_model_params(world.built, world.engine, K, seed=0)
        # identical params across lanes: disable DR noise by broadcasting env 0
        params_K = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], x.shape), params_K)
        st_K = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], (K,) + x.shape[1:]),
                            state0)
        V = jnp.asarray(np.asarray(controls[:H], np.float32))[None].repeat(K, 0)
        costs, vis = fr.rollout(st_K, params_K, V)
        costs = np.asarray(costs)
        # reconstruct the predicted block trajectory via a second rollout whose
        # vis body is the block root — cheaper: just compare the world engine's
        # XLA path stepping the same tape (planner-model == engine.step when
        # fidelity=world, so divergence fused-vs-XLA isolates the kernel)
        print(json.dumps({
            "phase": f"rollout:{fidelity}", "H": H,
            "cost_t0": round(float(costs[0, 0]), 3),
            "cost_tH": round(float(costs[0, -1]), 3),
            "cost_min_t": int(costs[0].argmin()),
        }), flush=True)

    # ---- 3) XLA engine replay (the rollout dynamics the solver would use
    # on the XLA path) for block-trajectory comparison ----
    st = jax.tree.map(lambda x: x[:1], state0)
    eng_step = jax.jit(jax.vmap(world.engine.step))
    params1 = jax.tree.map(lambda x: x[:1],
                           sample_model_params(world.built, world.engine, 1, seed=0))
    bi = world.scene.actor_index("block")
    cmd_map = world.built.cmd_map
    traj_x = []
    for t in range(n_steps):
        u = jnp.asarray(np.asarray(controls[t], np.float32))[None]
        st = st._replace(dof_target=cmd_map.apply(u, st.q))
        st = eng_step(st, params1)
        traj_x.append(np.asarray(st.root_pos[0, bi]).copy())
    traj_x = np.asarray(traj_x)
    dx = float(np.linalg.norm(traj_x[-1][:2] - goal))
    div = np.linalg.norm(traj_w - traj_x, axis=1)
    print(json.dumps({
        "phase": "xla_engine_replay", "block_final": traj_x[-1].tolist(),
        "dist_to_goal": round(dx, 3), "reached": dx < 0.2,
        "max_divergence_vs_world_m": round(float(div.max()), 4),
        "divergence_at_end_m": round(float(div[-1]), 4),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
