"""panda_stick_push diagnostic (round-3 verdict item 1): one observed episode
printing EE/block/goal geometry every N steps — does the stick reach the
block, does the block move, and is the 500-step budget simply too short
(the reference runs n_steps=10000; round-1 succeeded at step 393)?

Usage: python scripts/diag_stick.py [n_steps] [seed] [print_every]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_steps=1500, seed=0, every=25):
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.panda_stick_push import PandaStickPushObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/panda_stick_push", [f"mppi.seed_val={seed}"])
    obj = PandaStickPushObjective(cfg)

    def observer(step, world, action):
        if step % every:
            return
        v = world.view
        ee = np.asarray(v.link_position("panda_ee_tip", "panda"))[0]
        block = np.asarray(v.actor_position("panda_push_block"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        bq = np.asarray(world.get_actor_orientation_by_name("panda_push_block"))[0]
        print(
            f"step {step:4d} ee=({ee[0]:+.2f},{ee[1]:+.2f},{ee[2]:+.2f}) "
            f"block=({block[0]:+.2f},{block[1]:+.2f},{block[2]:+.3f}) "
            f"quat_z={bq[2]:+.2f} "
            f"|ee-b|={np.linalg.norm(ee - block):.3f} "
            f"|b-g|2d={np.linalg.norm(block[:2] - goal[:2]):.3f}",
            flush=True,
        )

    def success(world):
        bi = world.scene.actor_index("panda_push_block")
        gi = world.scene.actor_index("goal")
        b = np.asarray(world.state.root_pos[0, bi, :2])
        g = np.asarray(world.state.root_pos[0, gi, :2])
        return float(np.linalg.norm(b - g)) < 0.2

    m = run_task(cfg, obj, n_steps=int(n_steps), success_fn=success,
                 chunk_observer=observer, device_steps=16)
    print("success_step:", m.success_step, "steps:", m.steps)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
