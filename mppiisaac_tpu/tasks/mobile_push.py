"""boxer_push / heijn_push — non-prehensile pushing of a block to a goal pose
(reference `examples/heijn_push/planner.py:26-67`, `examples/boxer_push/`):
robot→block + block→goal + block yaw + push-align cosine + obstacle contact
force + block velocity."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import contact_force_mag, norm, push_align_cost, yaw_of


class MobilePushObjective(Objective):
    def __init__(self, cfg, robot: str, ee_link: str):
        self.robot = robot
        self.ee_link = ee_link
        goal = getattr(cfg, "goal", None) or [2.0, 2.0]
        self.goal = jnp.asarray(goal, jnp.float32)[:2]
        self.goal_yaw = 0.0
        self.weights = {
            "robot_to_block": 0.2,
            "block_to_goal": 2.0,
            "block_to_goal_ort": 3.0,
            "push_align": 0.6,
            "collision": 10.0,
            "velocity": 0.0,
        }

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        r_pos = view.link_position(self.ee_link, self.robot)[..., :2]
        block = view.actor_position("block")
        block_vel = view.actor_linvel("block")
        block_yaw = yaw_of(view.actor_orientation("block"))

        robot_to_block = r_pos - block[..., :2]
        block_to_goal = self.goal - block[..., :2]

        coll = contact_force_mag(view, "obst1", dims=2) + contact_force_mag(
            view, "obst2", dims=2
        )
        w = self.weights
        return (
            w["robot_to_block"] * norm(robot_to_block)
            + w["block_to_goal"] * norm(block_to_goal)
            + w["block_to_goal_ort"] * jnp.abs(block_yaw - self.goal_yaw)
            + w["push_align"] * push_align_cost(robot_to_block, block_to_goal)
            + w["collision"] * coll
            + w["velocity"] * norm(block_vel[..., :2])
        )


def run(robot="heijn", overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config(f"tasks/{robot}_push", overrides)
    ee = "front_link" if robot == "heijn" else "ee_link"
    obj = MobilePushObjective(cfg, robot, ee)

    def success(world):
        import numpy as np

        block = np.asarray(
            world.state.root_pos[0, world.scene.actor_index("block"), :2]
        )
        return float(np.linalg.norm(block - np.asarray(obj.goal))) < 0.2

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run("heijn", parse_cli(sys.argv[1:]), verbose=True).summary())
