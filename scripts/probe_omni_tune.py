"""omni_panda_pick solver-tuning probe (r5): the post-fix planner hovers at
the knife-edge grasp pose (gap 42 mm vs 40 mm block, 5 cm off-center) — the
grasp corridor has no cost gradient, so success must emerge from exploration.
Sweep (horizon, finger-noise sigma) single-seed episodes and report final
block-goal distance; candidates that engage get multi-seed validation.

Usage: python scripts/probe_omni_tune.py [combo ...]   combos like 6:2.5
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_combo(h, sig_grip, seed=0, n_steps=1500):
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    base = [20.0] * 3 + [8.0] * 3 + [8.0] * 4 + [sig_grip] * 2
    # reference sigma layout: base x/y/yaw 20, arm j1-j7 8, fingers sig_grip
    diag = [20.0] * 3 + [8.0] * 7 + [float(sig_grip)] * 2
    mat = [[diag[i] if i == j else 0.0 for j in range(12)] for i in range(12)]
    over = [f"mppi.horizon={int(h)}", f"mppi.seed_val={int(seed)}",
            f"mppi.noise_sigma={mat}"]
    cfg = load_config("tasks/omni_panda_pick", over)
    obj = OmniPandaPickObjective(cfg)
    tel = {}

    def success(world):
        v = world.view
        b = np.asarray(v.actor_position("block"))[0]
        g = np.asarray(v.actor_position("goal"))[0]
        tel["bg"] = float(np.linalg.norm(b - g))
        tel["b"] = np.round(b, 3).tolist()
        return tel["bg"] < 0.2

    m = run_task(cfg, obj, n_steps=n_steps, success_fn=success,
                 device_steps=16, use_fused=True)
    print(f"COMBO h={h} sig_grip={sig_grip} seed={seed}: success={m.success_step}"
          f" final|b-g|={tel.get('bg'):.3f} block={tel.get('b')}", flush=True)
    return m.success_step, tel.get("bg")


def main():
    combos = [c.split(":") for c in (sys.argv[1:] or
              ["6:2.5", "6:4.0", "12:2.5", "24:2.5"])]
    for h, s in combos:
        run_combo(float(h), float(s))


if __name__ == "__main__":
    main()
