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
        if robot == "boxer":
            # the REFERENCE weights (`examples/boxer_push/planner.py:12-19`).
            # Round 2 ran a "tuned" set with robot_to_block 0.6 (6× reference)
            # — that pull parks the robot against the block on whatever side
            # it arrives at and MPPI freezes in the local minimum (u→0,
            # measured round 3); the reference's 0.1 lets push_align steer the
            # approach around the block instead. Success @81 steps measured
            # with these + the reference solver config.
            self.weights = {
                "robot_to_block": 0.1,
                "block_to_goal": 2.0,
                "block_to_goal_ort": 3.0,
                "push_align": 0.6,
                "collision": 100.0,
                "velocity": 0.0,
            }
        else:
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


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        gx, gy = float(self.goal[0]), float(self.goal[1])
        robot, ee_link = self.robot, self.ee_link
        gyaw = float(self.goal_yaw)

        def fn(view, t):
            w = self.weights
            r = view.body_pos(ee_link, robot)
            block = view.actor_pos("block")
            bq = view.actor_quat("block")
            bv = view.actor_linvel("block")
            rbx, rby = r[0] - block[0], r[1] - block[1]
            bgx, bgy = gx - block[0], gy - block[1]
            d_rb = jnp.sqrt(rbx * rbx + rby * rby + 1e-12)
            d_bg = jnp.sqrt(bgx * bgx + bgy * bgy + 1e-12)
            yaw = L.yaw_of(bq)
            align = (rbx * bgx + rby * bgy) / jnp.maximum(d_rb * d_bg, 1e-6) + 1.0
            coll = 0.0
            for ob in ("obst1", "obst2"):
                f = view.actor_net_cf(ob)
                coll = coll + jnp.abs(f[0]) + jnp.abs(f[1])
            vel = jnp.sqrt(bv[0] * bv[0] + bv[1] * bv[1] + 1e-12)
            return (
                w["robot_to_block"] * d_rb
                + w["block_to_goal"] * d_bg
                + w["block_to_goal_ort"] * jnp.abs(yaw - gyaw)
                + w["push_align"] * align
                + w["collision"] * coll
                + w["velocity"] * vel
            )

        return fn


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
