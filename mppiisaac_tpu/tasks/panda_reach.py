"""panda / panda_effort reach tasks (reference `examples/panda/planner.py:10-40`,
`examples/panda_effort/`): EE-to-goal distance + upright orientation term."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import ee_upright_cost, norm


class PandaReachObjective(Objective):
    def __init__(self, cfg, ee_link: str = "panda_ee_tip"):
        self.ee_link = ee_link
        self.weights = {"robot_to_goal": 1.0, "robot_ori": 0.5}

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        r = view.link_state(self.ee_link, "panda")
        goal = view.actor_position("goal")
        dist = norm(r[..., 0:3] - goal)
        ori = ee_upright_cost(r[..., 3:7])
        return self.weights["robot_to_goal"] * dist + self.weights["robot_ori"] * ori


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        def fn(view, t):
            w = self.weights
            r = view.body_pos(self.ee_link, "panda")
            rq = view.body_quat(self.ee_link, "panda")
            goal = view.actor_pos("goal")
            dist = L.norm3(L.sub3(r, goal), eps=1e-12)
            _, p, y = L.euler_zyx(rq)
            ori = jnp.sqrt(y * y + p * p + 1e-12)
            return w["robot_to_goal"] * dist + w["robot_ori"] * ori

        return fn


def run(overrides=None, task="panda", **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config(f"tasks/{task}", overrides)
    ee = "panda_ee_tip" if task == "panda" else "panda_link7"
    obj = PandaReachObjective(cfg, ee_link=ee)

    def success(world):
        import numpy as np

        v = world.view
        ee_pos = np.asarray(v.link_position(ee, "panda"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        return float(np.linalg.norm(ee_pos - goal)) < 0.1

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
