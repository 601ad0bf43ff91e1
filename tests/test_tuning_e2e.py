"""End-to-end tuning harness: weights + noise_sigma applied live through the
planner (reference `examples/panda_pick/tuning.py` flow, optuna-free)."""
import numpy as np

from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
from mppiisaac_tpu.runtime.sim import Simulation
from mppiisaac_tpu.tasks.point_robot import PointRobotObjective
from mppiisaac_tpu.tasks.tuning import ParamSpec, Tuning
from mppiisaac_tpu.utils.config_store import load_config


def test_tuning_episodes_run_and_improve():
    cfg = load_config(
        "tasks/point_robot",
        ["mppi.num_samples=24", "mppi.horizon=6", "n_steps=10"],
    )
    world = Simulation(cfg.isaacgym, cfg.actors, num_envs=1)
    planner = MPPIisaacPlanner(cfg, PointRobotObjective(cfg), randomize=False, use_fused=False)

    goal = np.array([2.0, 2.0])

    def episode_cost(w):
        q = np.asarray(w.state.q[0])[:2]
        return float(np.linalg.norm(q - goal))

    tuner = Tuning(
        planner, world,
        weight_space={"nav": ParamSpec(0.1, 10.0), "obstacle": ParamSpec(0.001, 1.0),
                      "coll": ParamSpec(0.001, 1.0)},
        sigma_space=ParamSpec(0.3, 2.0),
        nu=3,
        n_steps=12,
        episode_cost=episode_cost,
    )
    best = tuner.tune(n_trials=3)
    assert best.value is not None and np.isfinite(best.value)
    assert set(best.params) == {"nav", "obstacle", "coll", "noise_sigma"}
