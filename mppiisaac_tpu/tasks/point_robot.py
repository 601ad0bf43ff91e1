"""point_robot goal-reach — the reference's simplest benchmark task
(`/root/reference` `benchmarks/point_robot/mppi_planner/mppi_planner_wrapper.py:16-33`):
nav distance + inverse-distance obstacle potential + contact-force collision."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView


class PointRobotObjective(Objective):
    def __init__(self, cfg, obstacle_names=()):
        goal = cfg.goal if getattr(cfg, "goal", None) is not None else [2.0, 2.0]
        self.nav_goal = jnp.asarray(goal, jnp.float32)[:2]
        self.obstacle_names = list(obstacle_names)
        self.weights = {"nav": 1.0, "obstacle": 0.1, "coll": 0.0}

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        pos = view.actor_q("point_robot")[..., :2]  # prismatic x, y
        nav = jnp.linalg.norm(pos - self.nav_goal, axis=-1)
        obstacle = jnp.zeros_like(nav)
        for name in self.obstacle_names:
            opos = view.actor_position(name)[..., :2]
            d = jnp.linalg.norm(pos - opos, axis=-1)
            obstacle = obstacle + 1.0 / jnp.maximum(d, 1e-3)
        # per-env summed contact force magnitude on the robot
        cf = view.actor_contact_forces("point_robot")
        coll = jnp.sum(jnp.linalg.norm(cf, axis=-1), axis=-1)
        w = self.weights
        return w["nav"] * nav + w["obstacle"] * obstacle + w["coll"] * coll


    def kernel_cost(self, scene):
        import numpy as _np

        gx = float(_np.asarray(self.nav_goal)[0])
        gy = float(_np.asarray(self.nav_goal)[1])

        def fn(view, t):
            w = self.weights
            q = view.actor_q("point_robot")
            dx = q[0] - gx
            dy = q[1] - gy
            cost = w["nav"] * jnp.sqrt(dx * dx + dy * dy + 1e-12)
            for name in self.obstacle_names:
                op = view.actor_pos(name)
                ox = q[0] - op[0]
                oy = q[1] - op[1]
                cost = cost + w["obstacle"] / jnp.maximum(
                    jnp.sqrt(ox * ox + oy * oy + 1e-12), 1e-3
                )
            cf = view.actor_net_cf("point_robot")
            cost = cost + w["coll"] * (jnp.abs(cf[0]) + jnp.abs(cf[1]) + jnp.abs(cf[2]))
            return cost

        return fn


def make_config(overrides=None):
    from ..utils.config_store import load_config

    return load_config("tasks/point_robot", overrides)


def run(overrides=None, **kw):
    from ..runtime.loop import run_task

    cfg = make_config(overrides)
    obj = PointRobotObjective(cfg)

    def success(world):
        q = world.state.q[0, :2]
        import numpy as np

        return float(jnp.linalg.norm(q - obj.nav_goal)) < 0.1

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    m = run(parse_cli(sys.argv[1:]), verbose=True)
    print(m.summary())
