"""omni_panda_pick aligned-grasp discriminator (round-4).

The r4 full-episode diag (diag_omni.py, 1500 steps) shows the hand approaches
to |h-b|~0.11 and parks ~5 cm off laterally; the one grasp attempt pushed the
block away. This script separates "approach alignment" from "grasp/transport
capability": run the normal episode to the stall, then TELEPORT the block to
the grasp center (midpoint of the finger bodies) with fingers opened, and let
the same MPPI planner continue. If it closes + lifts + carries, the gap is
approach alignment; if it still fails, the gap is grasp dynamics in the
rollout model.

Usage: python scripts/diag_omni_teleport.py [stall_steps] [seed] [post_steps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(stall_steps=900, seed=0, post_steps=500, *overrides):
    import jax.numpy as jnp

    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.runtime.loop import _build_chunk, _StateProxy
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick", [f"mppi.seed_val={seed}", *overrides])
    obj = OmniPandaPickObjective(cfg)
    world = Simulation(cfg=cfg.isaacgym, actors=cfg.actors,
                       init_positions=cfg.initial_actor_positions, num_envs=1)
    planner = MPPIisaacPlanner(cfg, obj)
    chunk, unpack = _build_chunk(cfg, world, planner, device_steps=16)

    def report(tag, step, st, act=None):
        v = _StateProxy(world, st).view
        hand = np.asarray(v.link_position("panda_hand", "omnipanda"))[0]
        block = np.asarray(v.actor_position("block"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        q = np.asarray(v.actor_q("omnipanda"))[0]
        grip = q[-2:]
        a = "" if act is None else (
            f" u_base=({act[0]:+.1f},{act[1]:+.1f},{act[2]:+.1f})"
            f" u_grip=({act[-2]:+.2f},{act[-1]:+.2f})")
        print(f"[{tag}] step {step:4d} hand=({hand[0]:+.2f},{hand[1]:+.2f},{hand[2]:+.2f})"
              f" block=({block[0]:+.2f},{block[1]:+.2f},{block[2]:+.3f})"
              f" |h-b|={np.linalg.norm(hand-block):.3f} |b-g|={np.linalg.norm(block-goal):.3f}"
              f" grip=({grip[0]:.3f},{grip[1]:.3f}){a}", flush=True)

    step = 0
    while step < int(stall_steps):
        planner.objective.reset()
        carry, wstate, packed = chunk(planner.mppi.carry, world.state)
        planner.mppi.carry = carry
        world.state = wstate
        states, acts = unpack(np.asarray(packed))
        if step % 96 == 0:
            report("pre", step, states[-1], acts[-1])
        step += 16

    # --- teleport: block to the grasp center, fingers opened ---
    fl = np.asarray(world.get_actor_link_by_name("panda_finger1", "omnipanda"))[0]
    fr = np.asarray(world.get_actor_link_by_name("panda_finger2", "omnipanda"))[0]
    hand = np.asarray(world.get_actor_link_by_name("panda_hand", "omnipanda"))[0]
    print(f"finger1={fl} finger2={fr} hand={hand}", flush=True)
    mid = 0.5 * (fl + fr)
    target = np.array([mid[0], mid[1], max(0.292, mid[2] - 0.045)], np.float32)
    world.set_actor_position_by_name("block", target)
    # open the fingers (last two DOFs) and zero their velocity
    ds = np.asarray(world.state.dof_state[0]).copy()
    ds[-2:, 0] = 0.038
    ds[-2:, 1] = 0.0
    world.set_dof_state(ds)
    report("TEL", step, world.state)

    while step < int(stall_steps) + int(post_steps):
        planner.objective.reset()
        carry, wstate, packed = chunk(planner.mppi.carry, world.state)
        planner.mppi.carry = carry
        world.state = wstate
        states, acts = unpack(np.asarray(packed))
        report("post", step, states[-1], acts[-1])
        step += 16
        b = np.asarray(world.get_actor_position_by_name("block"))[0]
        g = np.asarray(world.get_actor_position_by_name("goal"))[0]
        if np.linalg.norm(b - g) < 0.2:
            print(f"SUCCESS at step {step}", flush=True)
            break


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]], *sys.argv[4:])
