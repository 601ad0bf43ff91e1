"""anymal failing-seed diagnostic (r5: seeds 2 and 4 time out; 3/5 bar met
but the r4 verdict asks for a quantified gap note): print base position,
height, speed toward goal, and contact pattern every N steps to classify the
failure (falls? circles? stalls short?).

Usage: python scripts/diag_anymal_seed.py [seed] [n_steps] [print_every]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(seed=2, n_steps=1000, every=50):
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.anymal import AnymalObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/anymal", [f"mppi.seed_val={seed}",
                                       "mppi.use_priors=false"])
    obj = AnymalObjective(cfg)

    def observer(step, world, action):
        if step % every:
            return
        v = world.view
        base = np.asarray(v.link_position("base", "anymal"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        vel = np.asarray(world.state.root_linvel[0, 0])
        d = np.linalg.norm(base[:2] - goal[:2])
        to_goal = (goal[:2] - base[:2]) / max(d, 1e-9)
        v_g = float(vel[:2] @ to_goal)
        ncf = np.asarray(world.state.net_contact_force[0])
        feet_on = int((np.linalg.norm(ncf, axis=-1) > 5.0).sum())
        print(f"step {step:4d} base=({base[0]:+.2f},{base[1]:+.2f},z={base[2]:.3f}) "
              f"|b-g|={d:.2f} v_to_goal={v_g:+.2f} contacts>5N={feet_on}",
              flush=True)

    def success(world):
        v = world.view
        body = np.asarray(v.link_position("base", "anymal"))[0, :2]
        goal = np.asarray(v.actor_position("goal"))[0, :2]
        return float(np.linalg.norm(body - goal)) < 0.3

    m = run_task(cfg, obj, n_steps=int(n_steps), success_fn=success,
                 chunk_observer=observer, device_steps=16)
    print("success_step:", m.success_step, "steps:", m.steps)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
