"""boxer_reach / heijn_reach — mobile base drives to a goal around a wall
(reference `examples/boxer_reach/planner.py:15-24`, `examples/heijn_reach/`):
goal distance + wall contact-force penalty."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import contact_force_mag, norm


class MobileReachObjective(Objective):
    def __init__(self, cfg, robot: str):
        self.robot = robot
        goal = getattr(cfg, "goal", None) or [2.0, 2.0]
        self.goal = jnp.asarray(goal, jnp.float32)[:2]
        self.weights = {"goal": 1.0, "collision": 0.1}

    def _robot_xy(self, view: SimView):
        if self.robot == "heijn":
            return view.actor_q("heijn")[..., :2]
        return view.actor_position(self.robot)[..., :2]

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        xy = self._robot_xy(view)
        dist = norm(xy - self.goal)
        wall_f = contact_force_mag(view, "wall", dims=2)
        return self.weights["goal"] * dist + self.weights["collision"] * wall_f


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        gx, gy = float(self.goal[0]), float(self.goal[1])
        robot = self.robot

        def fn(view, t):
            w = self.weights
            if robot == "heijn":
                q = view.actor_q("heijn")
                dx, dy = q[0] - gx, q[1] - gy
            else:
                p = view.actor_pos(robot)
                dx, dy = p[0] - gx, p[1] - gy
            dist = jnp.sqrt(dx * dx + dy * dy + 1e-12)
            wf = view.actor_net_cf("wall")
            coll = jnp.abs(wf[0]) + jnp.abs(wf[1])
            return w["goal"] * dist + w["collision"] * coll

        return fn


def run(robot="boxer", overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config(f"tasks/{robot}_reach", overrides)
    obj = MobileReachObjective(cfg, robot)

    def success(world):
        import numpy as np

        if robot == "heijn":
            xy = np.asarray(world.state.q[0, :2])
        else:
            xy = np.asarray(world.state.root_pos[0, world.scene.actor_index(robot), :2])
        return float(np.linalg.norm(xy - np.asarray(obj.goal))) < 0.15

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run("boxer", parse_cli(sys.argv[1:]), verbose=True).summary())
