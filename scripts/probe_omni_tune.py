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


def run_combo(h, sig_grip, sig_base=20.0, sig_arm=8.0, seed=0, n_steps=1500):
    from mppiisaac_tpu.runtime.loop import run_task
    from mppiisaac_tpu.tasks.omni_panda_pick import OmniPandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    # reference sigma layout: base x/y/yaw 20, arm j1-j7 8, fingers 1.0
    diag = [float(sig_base)] * 3 + [float(sig_arm)] * 7 + [float(sig_grip)] * 2
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
    print(f"COMBO h={h} sg={sig_grip} sb={sig_base} sa={sig_arm} seed={seed}: success={m.success_step}"
          f" final|b-g|={tel.get('bg'):.3f} block={tel.get('b')}", flush=True)
    return m.success_step, tel.get("bg")


def main():
    for c in (sys.argv[1:] or ["6:1:5:3", "12:1:5:3"]):
        p = [float(v) for v in c.split(":")]
        # h:sig_grip[:sig_base[:sig_arm]]
        run_combo(p[0], p[1], p[2] if len(p) > 2 else 20.0,
                  p[3] if len(p) > 3 else 8.0)


if __name__ == "__main__":
    main()
