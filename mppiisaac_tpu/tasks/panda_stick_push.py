"""panda_stick_push — Franka with a rigid stick pushes a block across a table
(reference `examples/panda_stick_push/planner.py:26-69`): adds block-height and
push-align terms + table contact force to the mobile-push recipe."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import contact_force_mag, norm, push_align_cost, yaw_of


class PandaStickPushObjective(Objective):
    def __init__(self, cfg=None):
        self.weights = {
            "robot_to_block": 1.0,
            "block_to_goal": 6.0,
            "block_to_goal_ort": 1.0,
            "push_align": 0.6,
            "collision": 8.0,
            "block_height": 8.0,
        }
        self.goal_yaw = 0.0

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        ee = view.link_position("panda_ee_tip", "panda")
        block = view.actor_position("panda_push_block")
        goal = view.actor_position("goal")
        block_yaw = yaw_of(view.actor_orientation("panda_push_block"))
        table_top = view.actor_position("table")[..., 2] + 0.15

        robot_to_block = ee[..., :2] - block[..., :2]
        block_to_goal = goal[..., :2] - block[..., :2]

        w = self.weights
        return (
            w["robot_to_block"] * norm(ee - block)
            + w["block_to_goal"] * norm(block_to_goal)
            + w["block_to_goal_ort"] * jnp.abs(block_yaw - self.goal_yaw)
            + w["push_align"] * push_align_cost(robot_to_block, block_to_goal)
            + w["collision"] * contact_force_mag(view, "table")
            + w["block_height"] * jnp.abs(block[..., 2] - table_top)
        )


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        gyaw = float(self.goal_yaw)

        def fn(view, t):
            w = self.weights
            ee = view.body_pos("panda_ee_tip", "panda")
            block = view.actor_pos("panda_push_block")
            goal = view.actor_pos("goal")
            byaw = L.yaw_of(view.actor_quat("panda_push_block"))
            table_top = view.actor_pos("table")[2] + 0.15
            rbx, rby = ee[0] - block[0], ee[1] - block[1]
            bgx, bgy = goal[0] - block[0], goal[1] - block[1]
            d_rb3 = L.norm3(L.sub3(ee, block), eps=1e-12)
            d_rb = jnp.sqrt(rbx * rbx + rby * rby + 1e-12)
            d_bg = jnp.sqrt(bgx * bgx + bgy * bgy + 1e-12)
            align = (rbx * bgx + rby * bgy) / jnp.maximum(d_rb * d_bg, 1e-6) + 1.0
            tf = view.actor_net_cf("table")
            coll = jnp.abs(tf[0]) + jnp.abs(tf[1]) + jnp.abs(tf[2])
            return (
                w["robot_to_block"] * d_rb3
                + w["block_to_goal"] * d_bg
                + w["block_to_goal_ort"] * jnp.abs(byaw - gyaw)
                + w["push_align"] * align
                + w["collision"] * coll
                + w["block_height"] * jnp.abs(block[2] - table_top)
            )

        return fn


def run(overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config("tasks/panda_stick_push", overrides)
    obj = PandaStickPushObjective(cfg)

    def success(world):
        import numpy as np

        v = world.view
        block = np.asarray(v.actor_position("panda_push_block"))[0, :2]
        goal = np.asarray(v.actor_position("goal"))[0, :2]
        return float(np.linalg.norm(block - goal)) < 0.1

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
