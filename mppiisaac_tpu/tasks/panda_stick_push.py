"""panda_stick_push — Franka with a rigid stick pushes a block across a table.

Objective terms and weights mirror the reference exactly
(`examples/panda_stick_push/planner.py:10-69`): EE-to-block (3D) +
block-to-goal (3D, goal read from the scene marker) + EE upright (ZYX
euler[:2] norm) + |EE_z − block_z| height alignment + push-align cosine +
table contact force (weight 0 in the reference). Round 2 ran a divergent
"tuned" set (yaw term, block-lift term, no orientation term) that regressed to
0 successes — restored to reference parity in round 3."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import contact_force_mag, ee_upright_cost, norm, push_align_cost


class PandaStickPushObjective(Objective):
    def __init__(self, cfg=None):
        # reference weights (`examples/panda_stick_push/planner.py:12-19`)
        self.weights = {
            "robot_to_block": 5.0,
            "block_to_goal": 25.0,
            "collision": 0.0,
            "robot_ori": 5.0,
            "block_height": 20.0,
            "push_align": 45.0,
        }

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        ee = view.link_position("panda_ee_tip", "panda")
        ee_q = view.link_orientation("panda_ee_tip", "panda")
        block = view.actor_position("panda_push_block")
        goal = view.actor_position("goal")

        robot_to_block = ee - block
        block_to_goal = goal - block

        w = self.weights
        return (
            w["robot_to_block"] * norm(robot_to_block)
            + w["block_to_goal"] * norm(block_to_goal)
            + w["collision"] * contact_force_mag(view, "table")
            + w["robot_ori"] * ee_upright_cost(ee_q)
            + w["block_height"] * jnp.abs(ee[..., 2] - block[..., 2])
            + w["push_align"]
            * push_align_cost(robot_to_block[..., :2], block_to_goal[..., :2])
        )

    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        def fn(view, t):
            w = self.weights
            ee = view.body_pos("panda_ee_tip", "panda")
            eq = view.body_quat("panda_ee_tip", "panda")
            block = view.actor_pos("panda_push_block")
            goal = view.actor_pos("goal")
            rb = L.sub3(ee, block)
            bg = L.sub3(goal, block)
            d_rb3 = L.norm3(rb, eps=1e-12)
            d_bg3 = L.norm3(bg, eps=1e-12)
            d_rb2 = jnp.sqrt(rb[0] * rb[0] + rb[1] * rb[1] + 1e-12)
            d_bg2 = jnp.sqrt(bg[0] * bg[0] + bg[1] * bg[1] + 1e-12)
            align = (rb[0] * bg[0] + rb[1] * bg[1]) / jnp.maximum(
                d_rb2 * d_bg2, 1e-6
            ) + 1.0
            _, p, y = L.euler_zyx(eq)
            ori = jnp.sqrt(y * y + p * p + 1e-12)
            tf = view.actor_net_cf("table")
            coll = jnp.abs(tf[0]) + jnp.abs(tf[1]) + jnp.abs(tf[2])
            return (
                w["robot_to_block"] * d_rb3
                + w["block_to_goal"] * d_bg3
                + w["collision"] * coll
                + w["robot_ori"] * ori
                + w["block_height"] * jnp.abs(ee[2] - block[2])
                + w["push_align"] * align
            )

        return fn


def run(overrides=None, **kw):
    from ..runtime.loop import run_task
    from ..utils.config_store import load_config

    cfg = load_config("tasks/panda_stick_push", overrides)
    obj = PandaStickPushObjective(cfg)

    def success(world):
        import numpy as np

        bi = world.scene.actor_index("panda_push_block")
        gi = world.scene.actor_index("goal")
        b = np.asarray(world.state.root_pos[0, bi, :2])
        g = np.asarray(world.state.root_pos[0, gi, :2])
        # The reference task has NO success criterion (its world.py loops for
        # 10000 steps with no check) and its goal marker at (1,1) lies beyond
        # the fixed arm's reach: min ‖tip−goal‖_xy = 0.344 over the full joint
        # space (scripts/reach_analysis.py), so a block can physically get no
        # closer than ~0.30. Gate at 0.40: ~0.75 m of directed pushing,
        # reached at ~step 1150 in the observed TPU episode (diag_stick.py).
        return float(np.linalg.norm(b - g)) < 0.4

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
