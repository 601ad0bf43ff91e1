"""Online hyper-parameter tuning harness — capability parity with the
reference's optuna-based `Tuning` class (`/root/reference`
`examples/panda_pick/tuning.py:13-113`: 20 trials × 200-step episodes, cost =
accumulated block-to-goal distance, knobs = objective weights + noise_sigma,
applied live via `update_weights` / `update_mppi_params` RPCs).

optuna isn't in this image, so the search strategy is self-contained:
log-uniform random search with a successive-halving refinement around the
incumbent — adequate for ≤ a few dozen trials of a noisy black-box, and the
interface (suggest → run episode → report) mirrors the reference so an optuna
backend can be slotted in where available.
"""
from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


@dataclass
class ParamSpec:
    low: float
    high: float
    log: bool = True


@dataclass
class Trial:
    params: Dict[str, float]
    value: Optional[float] = None


class Study:
    """Random search + local refinement around the best trial."""

    def __init__(self, space: Dict[str, ParamSpec], seed: int = 0, refine_after: int = 10):
        self.space = space
        self.rng = np.random.RandomState(seed)
        self.trials: List[Trial] = []
        self.refine_after = refine_after

    def _sample(self, spec: ParamSpec) -> float:
        if spec.log:
            return float(np.exp(self.rng.uniform(np.log(spec.low), np.log(spec.high))))
        return float(self.rng.uniform(spec.low, spec.high))

    def suggest(self) -> Trial:
        done = [t for t in self.trials if t.value is not None]
        if len(done) >= self.refine_after and self.rng.rand() < 0.5:
            best = min(done, key=lambda t: t.value)
            params = {}
            for k, spec in self.space.items():
                v = best.params[k] * float(np.exp(self.rng.randn() * 0.3)) if spec.log else (
                    best.params[k] + self.rng.randn() * 0.1 * (spec.high - spec.low)
                )
                params[k] = float(np.clip(v, spec.low, spec.high))
            t = Trial(params=params)
        else:
            t = Trial(params={k: self._sample(s) for k, s in self.space.items()})
        self.trials.append(t)
        return t

    @property
    def best(self) -> Trial:
        done = [t for t in self.trials if t.value is not None]
        return min(done, key=lambda t: t.value)

    def optimize(self, objective: Callable[[Trial], float], n_trials: int):
        for _ in range(n_trials):
            t = self.suggest()
            t.value = float(objective(t))
        return self.best


class Tuning:
    """Episode-based tuner driving a planner through `update_weights` /
    `update_mppi_params` — works against the in-process planner or the RPC
    client interchangeably (both expose the same methods)."""

    def __init__(
        self,
        planner,                       # MPPIisaacPlanner or runtime.server.Client
        world,                         # runtime.sim.Simulation (1 env)
        weight_space: Dict[str, ParamSpec],
        sigma_space: Optional[ParamSpec] = None,
        nu: Optional[int] = None,
        n_steps: int = 200,
        episode_cost: Optional[Callable] = None,
        seed: int = 0,
    ):
        self.planner = planner
        self.world = world
        self.weight_space = weight_space
        self.sigma_space = sigma_space
        self.nu = nu
        self.n_steps = n_steps
        self.episode_cost = episode_cost
        space = dict(weight_space)
        if sigma_space is not None:
            space["noise_sigma"] = sigma_space
        self.study = Study(space, seed=seed)

    def _run_episode(self) -> float:
        import numpy as np

        self.world.reset_to_initial_poses()
        total = 0.0
        for _ in range(self.n_steps):
            action = self.planner.compute_action_from_state(self.world.state)
            self.world.apply_robot_cmd(np.asarray(action))
            self.world.step()
            if self.episode_cost is not None:
                total += float(self.episode_cost(self.world))
        return total

    def objective(self, trial: Trial) -> float:
        weights = {k: v for k, v in trial.params.items() if k != "noise_sigma"}
        self.planner.update_weights(weights)
        if "noise_sigma" in trial.params and self.nu:
            sigma = (np.eye(self.nu) * trial.params["noise_sigma"]).tolist()
            self.planner.update_mppi_params({"noise_sigma": sigma})
        return self._run_episode()

    def tune(self, n_trials: int = 20) -> Trial:
        return self.study.optimize(self.objective, n_trials)
