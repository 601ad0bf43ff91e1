"""panda_pick — Franka + gripper picks a block and carries it to the goal
(reference `examples/panda_pick/planner.py:10-53`; the BASELINE flagship task:
K=1000 samples)."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import contact_force_mag, ee_upright_cost, norm


class PandaPickObjective(Objective):
    def __init__(self, cfg=None):
        self.weights = {
            "robot_to_block": 40.0,
            "block_to_goal": 10.0,
            "collision": 26.0,
            "robot_ori": 2.0,
        }

    def reset(self):
        pass

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        r = view.link_state("panda_ee", "panda")
        block = view.actor_position("panda_pick_block")
        goal = view.actor_position("goal")
        table_f = contact_force_mag(view, "table")

        w = self.weights
        return (
            w["robot_to_block"] * norm(r[..., 0:3] - block)
            + w["block_to_goal"] * norm(block - goal)
            + w["collision"] * table_f
            + w["robot_ori"] * ee_upright_cost(r[..., 3:7])
        )

    def kernel_cost(self, scene):
        """Same cost in lanes form for the fused Pallas rollout."""
        from ..ops.pallas import lanes as L

        def fn(view, t):
            w = self.weights
            r = view.body_pos("panda_ee", "panda")
            rq = view.body_quat("panda_ee", "panda")
            block = view.actor_pos("panda_pick_block")
            goal = view.actor_pos("goal")
            tf = view.actor_net_cf("table")
            d_rb = L.norm3(L.sub3(r, block), eps=1e-12)
            d_bg = L.norm3(L.sub3(block, goal), eps=1e-12)
            forces = jnp.abs(tf[0]) + jnp.abs(tf[1]) + jnp.abs(tf[2])
            _, p, y = L.euler_zyx(rq)
            ori = jnp.sqrt(y * y + p * p + 1e-12)
            return (
                w["robot_to_block"] * d_rb
                + w["block_to_goal"] * d_bg
                + w["collision"] * forces
                + w["robot_ori"] * ori
            )

        return fn


def run(overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config("tasks/panda_pick", overrides)
    obj = PandaPickObjective(cfg)

    def success(world):
        import numpy as np

        v = world.view
        block = np.asarray(v.actor_position("panda_pick_block"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        # reference success: ‖block − goal‖ < 0.2 (`examples/omni_panda_pick/world.py:66-75`)
        return float(np.linalg.norm(block - goal)) < 0.2

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
