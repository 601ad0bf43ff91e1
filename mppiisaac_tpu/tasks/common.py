"""Shared objective terms and task plumbing for the reference task suite
(SURVEY §2.3 inventory)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..physics.math3d import quat_to_euler_zyx, quat_to_yaw
from ..planner.observables import SimView
from ..utils.config_store import ExampleConfig, load_config


def norm(x, axis=-1):
    return jnp.linalg.norm(x, axis=axis)


def ee_upright_cost(quat):
    """‖(yaw-ish, pitch-ish)‖ of an EE quaternion — the reference's
    pytorch3d ZYX-euler[:, :2] term (`examples/panda/planner.py:30-33`)."""
    r, p, y = quat_to_euler_zyx(quat)
    return jnp.sqrt(y * y + p * p + 1e-12)


def push_align_cost(robot_to_block, block_to_goal):
    """Cosine alignment term (+1 offset) — reference
    `examples/heijn_push/planner.py:45-49`."""
    num = jnp.sum(robot_to_block * block_to_goal, axis=-1)
    den = norm(robot_to_block) * norm(block_to_goal)
    return num / jnp.maximum(den, 1e-6) + 1.0


def contact_force_mag(view: SimView, actor: str, dims=3):
    f = view.get_actor_contact_forces_by_name(actor, "box")
    return jnp.sum(jnp.abs(f[..., :dims]), axis=-1)


def yaw_of(quat):
    return quat_to_yaw(quat)


def run_objective_task(task_name, objective_cls, overrides=None, success_fn=None, **kw):
    from ..runtime.loop import run_task

    cfg = load_config(f"tasks/{task_name}", overrides)
    obj = objective_cls(cfg)
    return run_task(cfg, obj, success_fn=success_fn, **kw)
