"""omni_panda_pick — 12-DOF holonomic-base Franka, effort mode, picks a block
(reference `examples/omni_panda_pick/planner.py:31-89`): 9 cost terms incl.
comfy arm/gripper pose, base/arm velocity penalties, EE height floor."""
from __future__ import annotations

import jax.numpy as jnp

from ..planner.objective import Objective
from ..planner.observables import SimView
from .common import contact_force_mag, ee_upright_cost, norm


class OmniPandaPickObjective(Objective):
    def __init__(self, cfg=None):
        # weights/targets are the reference's behavioral spec
        # (examples/omni_panda_pick/planner.py:12-25): comfy_gripper_state
        # [0.025, 0.025] @ w=200 prefers fingers closed onto the 4 cm block
        # (grip q=0.02 each) over open (0.04) or closed-empty (0.0)
        self.weights = {
            "robot_to_block": 10.0,
            "block_to_goal": 4.0,
            "collision": 0.1,
            "robot_ori": 1.0,
            "base_vel": 2.0,
            "arm_vel": 0.1,
            "comfy_arm_pose": 0.1,
            "comfy_gripper_state": 200.0,
            "height_cost": 10000.0,
        }
        self.comfy_arm_pose = jnp.asarray(
            [-1.57, -0.94, 0.0, -2.8, 0.0, 1.8675, 0.75], jnp.float32
        )
        self.comfy_gripper_state = jnp.asarray([0.025, 0.025], jnp.float32)

    def reset(self):
        pass

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        r = view.link_state("panda_hand", "omnipanda")
        block = view.actor_position("block")
        goal = view.actor_position("goal")
        q = view.actor_q("omnipanda")
        qd = view.actor_qd("omnipanda")

        base_vel = qd[..., 0:3]
        arm_vel = qd[..., 3:10]
        arm_pos = q[..., 3:10]
        gripper = q[..., -2:]

        w = self.weights
        return (
            w["robot_to_block"] * norm(r[..., 0:3] - block)
            + w["block_to_goal"] * norm(block - goal)
            + w["collision"] * contact_force_mag(view, "table")
            + w["robot_ori"] * ee_upright_cost(r[..., 3:7])
            + w["base_vel"] * jnp.sum(base_vel**2, axis=-1)
            + w["arm_vel"] * jnp.sum(arm_vel**2, axis=-1)
            + w["comfy_arm_pose"] * jnp.sum((arm_pos - self.comfy_arm_pose) ** 2, axis=-1)
            + w["comfy_gripper_state"] * jnp.sum((gripper - self.comfy_gripper_state) ** 2, axis=-1)
            + w["height_cost"] * jnp.maximum(0.12 - r[..., 2], 0.0)
        )


    def kernel_cost(self, scene):
        from ..ops.pallas import lanes as L

        comfy = [float(v) for v in np.asarray(self.comfy_arm_pose)]
        comfy_g = [float(v) for v in np.asarray(self.comfy_gripper_state)]

        def fn(view, t):
            w = self.weights
            r = view.body_pos("panda_hand", "omnipanda")
            rq = view.body_quat("panda_hand", "omnipanda")
            block = view.actor_pos("block")
            goal = view.actor_pos("goal")
            q = view.actor_q("omnipanda")
            qd = view.actor_qd("omnipanda")
            tf = view.actor_net_cf("table")
            base_vel = sum(qd[i] * qd[i] for i in range(3))
            arm_vel = sum(qd[i] * qd[i] for i in range(3, 10))
            arm_pose = sum((q[3 + i] - comfy[i]) ** 2 for i in range(7))
            grip = sum((q[-2 + i] - comfy_g[i]) ** 2 for i in range(2))
            _, p, y = L.euler_zyx(rq)
            return (
                w["robot_to_block"] * L.norm3(L.sub3(r, block), eps=1e-12)
                + w["block_to_goal"] * L.norm3(L.sub3(block, goal), eps=1e-12)
                + w["collision"] * (jnp.abs(tf[0]) + jnp.abs(tf[1]) + jnp.abs(tf[2]))
                + w["robot_ori"] * jnp.sqrt(y * y + p * p + 1e-12)
                + w["base_vel"] * base_vel
                + w["arm_vel"] * arm_vel
                + w["comfy_arm_pose"] * arm_pose
                + w["comfy_gripper_state"] * grip
                + w["height_cost"] * jnp.maximum(0.12 - r[2], 0.0)
            )

        return fn


import numpy as np  # noqa: E402


def run(overrides=None, **kw):
    from ..utils.config_store import load_config
    from ..runtime.loop import run_task

    cfg = load_config("tasks/omni_panda_pick", overrides)
    obj = OmniPandaPickObjective(cfg)

    def success(world):
        import numpy as np

        v = world.view
        block = np.asarray(v.actor_position("block"))[0]
        goal = np.asarray(v.actor_position("goal"))[0]
        return float(np.linalg.norm(block - goal)) < 0.2

    return run_task(cfg, obj, success_fn=success, **kw)


if __name__ == "__main__":
    import sys

    from ..utils.confsys import parse_cli

    print(run(parse_cli(sys.argv[1:]), verbose=True).summary())
