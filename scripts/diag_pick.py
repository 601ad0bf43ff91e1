"""panda_pick failure-mode telemetry (round-3: 10-seed sweep measured 4/10 at
the shipped config — which phase fails on the failing seeds: approach, grasp
capture, lift, or transport?).

Prints per-step EE/block/goal geometry + finger state every N steps for each
seed, via the chunked-loop observer (reuses the cached device_steps=16
program).

Usage: python scripts/diag_pick.py [seeds_csv] [n_steps] [print_every]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_seed(seed, n_steps=500, every=25, overrides=()):
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/panda_pick",
                      [f"mppi.seed_val={seed}", *overrides])
    obj = PandaPickObjective(cfg)

    def observer(step, world, action):
        if step % every:
            return
        v = world.view
        ee = np.asarray(v.link_position("panda_hand", "panda"))[0]
        block = np.asarray(v.actor_position("panda_pick_block"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        q = np.asarray(v.actor_q("panda"))[0]
        grip = q[-2:]
        print(
            f"s{seed} step {step:4d} ee=({ee[0]:+.2f},{ee[1]:+.2f},{ee[2]:+.2f}) "
            f"block=({block[0]:+.2f},{block[1]:+.2f},{block[2]:+.3f}) "
            f"|ee-b|={np.linalg.norm(ee - block):.3f} "
            f"|b-g|={np.linalg.norm(block - goal):.3f} "
            f"grip=({grip[0]:.3f},{grip[1]:.3f}) u_g={float(np.asarray(action).reshape(-1)[-1]):+.2f}",
            flush=True,
        )

    def success(world):
        v = world.view
        b = np.asarray(v.actor_position("panda_pick_block"))[0]
        g = np.asarray(v.actor_position("goal"))[0]
        return float(np.linalg.norm(b - g)) < 0.2

    m = run_task(cfg, obj, n_steps=int(n_steps), success_fn=success,
                 chunk_observer=observer, device_steps=16)
    print(f"SEED {seed} success_step: {m.success_step} steps: {m.steps}",
          flush=True)


def main(seeds="0,2,3", n_steps=500, every=25, *overrides):
    for s in str(seeds).split(","):
        run_seed(int(s), int(n_steps), int(every), overrides)


if __name__ == "__main__":
    main(*sys.argv[1:])
