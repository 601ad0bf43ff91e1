"""boxer_push failing-seed diagnostic: per-chunk robot/block/goal geometry.

boxer_push is seed-marginal (r3: seed 2 succeeds @73, seeds 0/1 time out at
500). This prints where the failing seeds get stuck: approach? wrong side?
block pushed off-course? frozen solver?

Usage: python scripts/diag_boxer.py [n_steps] [seed] [print_every] [K]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_steps=500, seed=0, every=25, K=0):
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.mobile_push import MobilePushObjective
    from mppiisaac_tpu.utils.config_store import load_config

    over = [f"mppi.seed_val={seed}"]
    if int(K):
        over.append(f"mppi.num_samples={K}")
    cfg = load_config("tasks/boxer_push", over)
    obj = MobilePushObjective(cfg, "boxer", "ee_link")
    goal = np.asarray(cfg.goal, np.float64)[:2]

    def observer(step, world, action):
        if step % every:
            return
        v = world.view
        r = np.asarray(v.link_position("ee_link", "boxer"))[0][:2]
        b = np.asarray(v.actor_position("block"))[0]
        rb = b[:2] - r
        bg = goal - b[:2]
        align = float(rb @ bg) / max(np.linalg.norm(rb) * np.linalg.norm(bg), 1e-9)
        print(
            f"step {step:4d} ee=({r[0]:+.2f},{r[1]:+.2f}) "
            f"block=({b[0]:+.2f},{b[1]:+.2f},z={b[2]:+.3f}) "
            f"|r-b|={np.linalg.norm(rb):.3f} |b-g|={np.linalg.norm(bg):.3f} "
            f"align={align:+.2f} u=({float(action[0]):+.2f},{float(action[1]):+.2f})",
            flush=True,
        )

    def success(world):
        b = np.asarray(world.state.root_pos[0, world.scene.actor_index("block"), :2])
        return float(np.linalg.norm(b - goal)) < 0.2

    m = run_task(cfg, obj, n_steps=int(n_steps), success_fn=success,
                 chunk_observer=observer, device_steps=16)
    print("success_step:", m.success_step, "steps:", m.steps)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:5]])
