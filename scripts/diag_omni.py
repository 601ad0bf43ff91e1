"""omni_panda_pick diagnostic (round-3 verdict item 2): one observed episode
printing the approach/grasp/transport state machine every N steps — is the
failure in base approach, grasp capture, lift, or transport?

Usage: python scripts/diag_omni.py [n_steps] [seed] [print_every]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_steps=600, seed=0, every=25, use_fused=1, *overrides):
    mu = os.environ.get("MU_SPINDLE")
    if mu is not None:
        import mppiisaac_tpu.physics.stacked as stk

        stk.MU_SPINDLE = float(mu)
        print(f"MU_SPINDLE={stk.MU_SPINDLE}")
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/omni_panda_pick",
                      [f"mppi.seed_val={seed}", *overrides])
    obj = OmniPandaPickObjective(cfg)

    def observer(step, world, action):
        if step % every:
            return
        v = world.view
        hand = np.asarray(v.link_position("panda_hand", "omnipanda"))[0]
        block = np.asarray(v.actor_position("block"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        q = np.asarray(v.actor_q("omnipanda"))[0]
        base = q[:3]
        grip = q[-2:]
        print(
            f"step {step:4d} base=({base[0]:+.2f},{base[1]:+.2f},th={base[2]:+.2f}) "
            f"hand=({hand[0]:+.2f},{hand[1]:+.2f},{hand[2]:+.2f}) "
            f"block=({block[0]:+.2f},{block[1]:+.2f},{block[2]:+.2f}) "
            f"|h-b|={np.linalg.norm(hand - block):.3f} "
            f"|b-g|={np.linalg.norm(block - goal):.3f} "
            f"grip=({grip[0]:.3f},{grip[1]:.3f}) "
            f"u_base=({float(action[0]):+.1f},{float(action[1]):+.1f},{float(action[2]):+.1f}) "
            f"u_grip={float(action[-1]):+.2f}",
            flush=True,
        )

    def success(world):
        v = world.view
        b = np.asarray(v.actor_position("block"))[0]
        g = np.asarray(v.actor_position("goal"))[0]
        return float(np.linalg.norm(b - g)) < 0.2

    # chunk_observer: per-step telemetry from the stacked chunk states —
    # reuses the cached device_steps=16 program (the per-step observer path
    # compiles a separate program; >15 min on this backend, diag timed out)
    m = run_task(cfg, obj, n_steps=int(n_steps), success_fn=success,
                 chunk_observer=observer, device_steps=16,
                 use_fused=bool(int(use_fused)))
    print("success_step:", m.success_step, "steps:", m.steps)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]], *sys.argv[5:])
