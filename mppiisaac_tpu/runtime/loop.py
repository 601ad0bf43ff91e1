"""Single-process control loop: world sim + MPPI planner in one process.

The reference splits world and planner across two processes over zerorpc TCP
solely because Isaac Gym can't host two sims in one process
(`/root/reference` `docs/source/structure.rst:37`, `examples/panda/world.py:33-59`).
A JAX sim has no such constraint — world and rollout sims are two pytrees —
so the split collapses and the per-step TCP round-trip disappears (the
BASELINE.json north-star structure). Real-time pacing + FPS/RT metrics parity:
`examples/panda/world.py:52-59`.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import numpy as np

from ..planner.mppi_isaac import MPPIisaacPlanner
from ..utils.config_store import ExampleConfig
from .sim import Simulation


@dataclass
class LoopMetrics:
    fps: List[float] = field(default_factory=list)
    rt_factor: List[float] = field(default_factory=list)
    solver_time: List[float] = field(default_factory=list)
    path_length: float = 0.0
    steps: int = 0
    success_step: Optional[int] = None
    final_state_finite: bool = True

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "mean_fps": float(np.mean(self.fps)) if self.fps else 0.0,
            "mean_rt": float(np.mean(self.rt_factor)) if self.rt_factor else 0.0,
            "mean_solver_time_ms": float(np.mean(self.solver_time) * 1e3) if self.solver_time else 0.0,
            "path_length": self.path_length,
            "success_step": self.success_step,
            "time2goal": (None if self.success_step is None else self.success_step),
        }


def run_task(
    cfg: ExampleConfig,
    objective,
    prior=None,
    n_steps: Optional[int] = None,
    real_time: bool = False,
    success_fn: Optional[Callable] = None,
    observer: Optional[Callable] = None,
    verbose: bool = False,
    randomize: bool = True,
) -> LoopMetrics:
    """success_fn(world: Simulation) -> bool; observer(step, world, action)."""
    world = Simulation(
        cfg=cfg.isaacgym,
        actors=cfg.actors,
        init_positions=cfg.initial_actor_positions,
        num_envs=1,
    )
    # place the goal marker from cfg.goal (the reference moves it via viewer
    # teleop; headless runs set it here; rollouts read it from world state)
    if getattr(cfg, "goal", None) is not None and "goal" in [s_.name for s_ in world.built.specs]:
        gp = np.zeros(3)
        g = np.asarray(cfg.goal, dtype=np.float64).reshape(-1)
        gp[: len(g)] = g[:3]
        world.set_actor_position_by_name("goal", gp)
    planner = MPPIisaacPlanner(cfg, objective, prior, randomize=randomize)
    metrics = LoopMetrics()
    n = n_steps if n_steps is not None else cfg.n_steps
    dt = cfg.isaacgym.dt
    prev_pos = None

    for step in range(n):
        t0 = time.perf_counter()
        action = planner.compute_action_from_state(world.state)
        action = jax.block_until_ready(action)
        t1 = time.perf_counter()
        # device arrays flow straight into the world step — the only host
        # fetch below is ONE batched device_get (each small transfer is a
        # full host<->device round-trip; N separate np.asarray calls would
        # serialize N of them into the loop)
        world.apply_robot_cmd(action)
        world.step()
        action_h, rp = jax.device_get((action, world.state.root_pos[0, 0]))
        t2 = time.perf_counter()

        metrics.solver_time.append(t1 - t0)
        actual = t2 - t0
        metrics.fps.append(1.0 / max(actual, 1e-9))
        metrics.rt_factor.append(dt / max(actual, 1e-9))
        metrics.steps = step + 1

        # path length of the first robot's root/ee
        if prev_pos is not None:
            metrics.path_length += float(np.linalg.norm(rp - prev_pos))
        prev_pos = rp
        action = action_h

        if observer is not None:
            observer(step, world, action)
        if verbose:
            print(
                f"step {step}: FPS {metrics.fps[-1]:8.1f}  RT {metrics.rt_factor[-1]:6.2f}  "
                f"solver {metrics.solver_time[-1]*1e3:7.2f} ms"
            )
        if success_fn is not None and metrics.success_step is None and success_fn(world):
            metrics.success_step = step
            break
        if real_time and actual < dt:
            time.sleep(dt - actual)
    metrics.final_state_finite = bool(
        all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree.leaves(world.state)
        )
    )
    return metrics
