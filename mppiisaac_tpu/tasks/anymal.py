"""anymal — quadruped locomotion to a goal with emergent gait from body/knee
height shaping (reference `examples/anymal/planner.py:22-48`)."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import norm


class AnymalObjective(Objective):
    def __init__(self, cfg=None):
        self.weights = {
            "robot_to_goal": 1.0,
            "robot_off_ground": 5.0,
            "knees_off_ground": 5.0,
        }
        self.body_height = 0.65
        self.knee_height = 0.35

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        body = view.link_position("base", "anymal")
        goal = view.actor_position("goal")
        front = view.link_position("face_front", "anymal")
        rear = view.link_position("face_rear", "anymal")

        body_off = (
            jnp.abs(body[..., 2] - self.body_height)
            + jnp.abs(front[..., 2] - self.body_height)
            + jnp.abs(rear[..., 2] - self.body_height)
        )
        knees_off = sum(
            jnp.abs(view.link_position(f"{leg}_KFE", "anymal")[..., 2] - self.knee_height)
            for leg in ("LF", "RF", "LH", "RH")
        )
        w = self.weights
        return (
            w["robot_to_goal"] * norm(body - goal)
            + w["robot_off_ground"] * body_off
            + w["knees_off_ground"] * knees_off
        )


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        bh, kh = float(self.body_height), float(self.knee_height)

        def fn(view, t):
            w = self.weights
            body = view.body_pos("base", "anymal")
            goal = view.actor_pos("goal")
            front = view.body_pos("face_front", "anymal")
            rear = view.body_pos("face_rear", "anymal")
            body_off = (
                jnp.abs(body[2] - bh) + jnp.abs(front[2] - bh) + jnp.abs(rear[2] - bh)
            )
            knees = 0.0
            for leg in ("LF", "RF", "LH", "RH"):
                knees = knees + jnp.abs(view.body_pos(f"{leg}_KFE", "anymal")[2] - kh)
            return (
                w["robot_to_goal"] * L.norm3(L.sub3(body, goal), eps=1e-12)
                + w["robot_off_ground"] * body_off
                + w["knees_off_ground"] * knees
            )

        return fn


def run(overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config("tasks/anymal", overrides)
    obj = AnymalObjective(cfg)
    prior = None
    if cfg.mppi.use_priors:
        from ..planner.priors import QuadrupedGaitPrior

        prior = QuadrupedGaitPrior(H=cfg.mppi.horizon, dt=cfg.isaacgym.dt)

    def success(world):
        import numpy as np

        v = world.view
        body = np.asarray(v.link_position("base", "anymal"))[0, :2]
        goal = np.asarray(v.actor_position("goal"))[0, :2]
        return float(np.linalg.norm(body - goal)) < 0.3

    return run_task(cfg, obj, prior=prior, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
