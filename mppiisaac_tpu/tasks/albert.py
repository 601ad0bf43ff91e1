"""albert — whole-body mobile manipulation: diff-drive base + 7-DOF arm drives
its EE to a goal (reference `examples/albert/planner.py:21-39`): EE-to-goal +
upright term."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import ee_upright_cost, norm


class AlbertObjective(Objective):
    def __init__(self, cfg=None):
        self.weights = {"robot_to_goal": 1.0, "robot_ori": 0.3}

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        from ..physics.math3d import quat_to_euler_zyx

        r = view.link_state("mmrobot_link7", "albert")
        goal = view.actor_position("goal")
        # upright = roll/pitch only: penalizing yaw would fight base rotation
        # (the EE yaw moves with the diff-drive base)
        roll, pitch, _ = quat_to_euler_zyx(r[..., 3:7])
        ori = jnp.sqrt(roll * roll + pitch * pitch + 1e-12)
        return self.weights["robot_to_goal"] * norm(r[..., 0:3] - goal) + self.weights[
            "robot_ori"
        ] * ori


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        def fn(view, t):
            w = self.weights
            r = view.body_pos("mmrobot_link7", "albert")
            rq = view.body_quat("mmrobot_link7", "albert")
            goal = view.actor_pos("goal")
            ro, p, _ = L.euler_zyx(rq)  # roll/pitch only (yaw follows the base)
            return w["robot_to_goal"] * L.norm3(L.sub3(r, goal), eps=1e-12) + w[
                "robot_ori"
            ] * jnp.sqrt(ro * ro + p * p + 1e-12)

        return fn


def run(overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config("tasks/albert", overrides)
    obj = AlbertObjective(cfg)

    def success(world):
        import numpy as np

        v = world.view
        ee = np.asarray(v.link_position("mmrobot_link7", "albert"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        return float(np.linalg.norm(ee - goal)) < 0.15

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
