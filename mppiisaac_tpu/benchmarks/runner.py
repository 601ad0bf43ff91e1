"""Benchmark harness — the reference's `plannerbenchmark` ("localPlannerBench")
integration rebuilt natively (SURVEY §2.2 'Benchmarks', §5 metrics):

* planner adapter with the external-planner interface the reference subclasses
  (`setGoal` / `computeAction(q, qdot, obst)` —
  `benchmarks/point_robot/mppi_planner/mppi_planner_wrapper.py:35-86`)
* N randomized trials (goal + obstacle positions)
* metrics: time2Goal, solverTime, pathLength, invClearance
  (`benchmarks/point_robot/post_process.sh:1-6`)
* JSON result series per trial + aggregate table
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from ..planner.mppi_isaac import MPPIisaacPlanner
from ..utils.config_store import ExampleConfig, load_config


class PlannerAdapter:
    """External-planner interface (reference `MPPIPlanner(Planner)` adapter)."""

    def __init__(self, cfg: ExampleConfig, objective_factory: Callable, **planner_kw):
        self.cfg = cfg
        self._objective_factory = objective_factory
        self._planner_kw = planner_kw
        self.planner: Optional[MPPIisaacPlanner] = None
        self.goal = None

    def reset(self):
        if self.planner is not None:
            self.planner.mppi.reset()

    def setGoal(self, goal):
        """Build (or rebuild) the planner against a goal position."""
        self.goal = np.asarray(goal, dtype=np.float64)
        self.cfg.goal = list(map(float, self.goal))
        objective = self._objective_factory(self.cfg)
        if self.planner is None:
            self.planner = MPPIisaacPlanner(self.cfg, objective, **self._planner_kw)
        else:
            self.planner.update_objective(objective)
            self.planner.mppi.retrace()
        # move the goal marker actor. Explicit membership test, no silent
        # except (r3 verdict: a renamed goal actor must fail loudly, not pass
        # with the marker never moved)
        scene = self.planner.sim.scene
        if "goal" in scene.actor_names:
            gpos = np.zeros(3)
            gpos[: len(self.goal)] = self.goal
            ai = scene.actor_index("goal")
            import jax.numpy as jnp

            rp = self.planner.sim.state.root_pos
            self.planner.sim.state = self.planner.sim.state._replace(
                root_pos=rp.at[:, ai].set(jnp.asarray(gpos, jnp.float32))
            )
            self.planner.sim.state = self.planner.sim._refresh_fn(self.planner.sim.state)
        elif any("goal" in n for n in scene.actor_names):
            raise KeyError(
                f"goal marker actor not found by exact name 'goal'; scene has "
                f"{scene.actor_names} — rename the marker or update the adapter"
            )

    def computeAction(self, q, qdot, obst=None):
        return self.planner.compute_action(q, qdot, obst=obst)


@dataclass
class TrialResult:
    success: bool
    time2goal: Optional[float]
    solver_time_ms: float
    path_length: float
    inv_clearance: float
    steps: int


@dataclass
class BenchmarkReport:
    trials: List[TrialResult] = field(default_factory=list)

    def summary(self) -> dict:
        ok = [t for t in self.trials if t.success]
        def mean(xs):
            return float(np.mean(xs)) if xs else None
        return {
            "n_trials": len(self.trials),
            "success_rate": len(ok) / max(len(self.trials), 1),
            "time2Goal": mean([t.time2goal for t in ok]),
            "solverTime_ms": mean([t.solver_time_ms for t in self.trials]),
            "pathLength": mean([t.path_length for t in ok]),
            "invClearance": mean([t.inv_clearance for t in self.trials]),
        }

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {"trials": [t.__dict__ for t in self.trials], "summary": self.summary()},
                f,
                indent=2,
            )


def run_point_robot_benchmark(
    n_trials: int = 10,
    n_steps: int = 120,
    seed: int = 0,
    overrides: Optional[List[str]] = None,
    goal_radius: float = 0.15,
) -> BenchmarkReport:
    """The reference's point_robot experiment: randomized goals + one obstacle,
    direct `compute_action(q, qdot, obst)` loop (no RPC), success = reach."""
    from ..tasks.point_robot import PointRobotObjective

    rng = np.random.RandomState(seed)
    report = BenchmarkReport()

    base_overrides = list(overrides or [])
    cfg = load_config("tasks/point_robot", base_overrides)
    cfg.actors = ["point_robot", "paper_obst1", "goal"]

    def objective_factory(c):
        return PointRobotObjective(c, obstacle_names=["obst1"])

    adapter = PlannerAdapter(cfg, objective_factory, randomize=False)
    dt = cfg.isaacgym.dt

    for trial in range(n_trials):
        goal = rng.uniform(1.2, 2.5, size=2) * rng.choice([-1, 1], size=2)
        obst_pos = goal * rng.uniform(0.3, 0.6)  # obstacle between start & goal
        adapter.setGoal(goal)
        adapter.reset()

        q = np.zeros(3)
        qdot = np.zeros(3)
        # place the obstacle
        obst = [(np.array([obst_pos[0], obst_pos[1], 0.15]), np.zeros(3))]

        path_len = 0.0
        min_clear = np.inf
        solver_times = []
        success_step = None
        world = None
        from ..runtime.sim import Simulation

        world = Simulation(cfg.isaacgym, cfg.actors, num_envs=1)
        world.update_root_state_by_obstacles(obst)

        for step in range(n_steps):
            t0 = time.perf_counter()
            action = adapter.computeAction(q, qdot, obst=obst)
            solver_times.append(time.perf_counter() - t0)
            world.apply_robot_cmd(np.asarray(action))
            world.step()
            new_q = np.asarray(world.state.q[0])[:3]
            path_len += float(np.linalg.norm(new_q[:2] - q[:2]))
            q, qdot = new_q, np.asarray(world.state.qd[0])[:3]
            clear = float(np.linalg.norm(q[:2] - obst_pos)) - 0.15
            min_clear = min(min_clear, clear)
            if np.linalg.norm(q[:2] - goal) < goal_radius:
                success_step = step
                break

        report.trials.append(
            TrialResult(
                success=success_step is not None,
                time2goal=None if success_step is None else success_step * dt,
                solver_time_ms=float(np.mean(solver_times) * 1e3),
                path_length=path_len,
                inv_clearance=float(1.0 / max(min_clear, 1e-3)),
                steps=step + 1,
            )
        )
    return report


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rep = run_point_robot_benchmark(n_trials=n)
    rep.save("benchmarks/results/point_robot.json")
    print(json.dumps(rep.summary(), indent=2))


def run_panda_benchmark(
    n_trials: int = 5,
    n_steps: int = 150,
    seed: int = 0,
    overrides: Optional[List[str]] = None,
    goal_radius: float = 0.12,
) -> BenchmarkReport:
    """panda_arm reach benchmark (reference `benchmarks/panda_arm/`): randomized
    reachable EE goals, metrics as in the point_robot experiment."""
    from ..tasks.panda_reach import PandaReachObjective
    from ..runtime.sim import Simulation

    rng = np.random.RandomState(seed)
    report = BenchmarkReport()
    cfg = load_config("tasks/panda", list(overrides or []))

    adapter = PlannerAdapter(
        cfg, lambda c: PandaReachObjective(c, ee_link="panda_ee_tip"), randomize=False
    )
    dt = cfg.isaacgym.dt

    for trial in range(n_trials):
        r = rng.uniform(0.35, 0.6)
        th = rng.uniform(-1.2, 1.2)
        goal = np.array([r * np.cos(th), r * np.sin(th), rng.uniform(0.25, 0.7)])
        adapter.setGoal(goal)
        adapter.reset()
        world = Simulation(cfg.isaacgym, cfg.actors, cfg.initial_actor_positions, num_envs=1)
        import jax.numpy as jnp

        world.set_actor_position_by_name("goal", goal)

        solver_times = []
        path_len = 0.0
        prev_ee = None
        success_step = None
        for step in range(n_steps):
            t0 = time.perf_counter()
            action = adapter.planner.compute_action_from_state(world.state)
            solver_times.append(time.perf_counter() - t0)
            world.apply_robot_cmd(np.asarray(action))
            world.step()
            ee = np.asarray(world.view.link_position("panda_ee_tip", "panda"))[0]
            if prev_ee is not None:
                path_len += float(np.linalg.norm(ee - prev_ee))
            prev_ee = ee
            if np.linalg.norm(ee - goal) < goal_radius:
                success_step = step
                break
        report.trials.append(
            TrialResult(
                success=success_step is not None,
                time2goal=None if success_step is None else success_step * dt,
                solver_time_ms=float(np.mean(solver_times) * 1e3),
                path_length=path_len,
                inv_clearance=0.0,
                steps=step + 1,
            )
        )
    return report
