"""Aux subsystems: priors, tuning study, config composer, benchmark adapter."""
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.utils import confsys


def test_confsys_compose_and_overrides(tmp_path):
    root = tmp_path
    (root / "mppi").mkdir()
    (root / "mppi" / "base.yaml").write_text("num_samples: 10\nlambda_: 0.1\n")
    (root / "mppi" / "task.yaml").write_text("defaults: [base]\nnum_samples: 99\n")
    (root / "tasks").mkdir()
    (root / "tasks" / "t.yaml").write_text(
        "defaults:\n  - mppi: task\nnx: 4\nactors: [a, b]\n"
    )
    cfg = confsys.compose(str(root), "tasks/t", ["mppi.lambda_=0.5", "nx=6"])
    assert cfg["mppi"]["num_samples"] == 99
    assert cfg["mppi"]["lambda_"] == 0.5
    assert cfg["nx"] == 6
    assert cfg["actors"] == ["a", "b"]


def test_confsys_cli_parse():
    assert confsys.parse_cli(["mppi.k=3", "--flag", "x=1"]) == ["mppi.k=3", "x=1"]


def test_tuning_study_converges():
    from mppiisaac_tpu.tasks.tuning import ParamSpec, Study

    study = Study({"w": ParamSpec(0.01, 100.0)}, seed=0)
    best = study.optimize(lambda t: (np.log(t.params["w"]) - np.log(3.0)) ** 2, 30)
    assert 0.5 < best.params["w"] < 18.0


def test_point_navigation_prior():
    from mppiisaac_tpu.planner.priors import PointNavigationPrior
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.builder import SimConfig

    sim = Simulation(SimConfig(dt=0.05, substeps=1), ["point_robot", "goal"], num_envs=1)
    sim.set_actor_position_by_name("goal", np.array([2.0, 0.0, 0.5]))
    prior = PointNavigationPrior()
    u = prior.compute_command(sim.view)
    u0 = np.asarray(u)[0]
    assert u0[0] > 0.5 and abs(u0[1]) < 1e-5  # pull straight toward +x


def test_arm_jacobian_prior_direction():
    from mppiisaac_tpu.planner.priors import ArmJacobianPrior
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.scene.builder import SimConfig

    sim = Simulation(SimConfig(dt=0.05, substeps=2), ["panda_stick", "goal"], num_envs=1)
    sim.set_actor_position_by_name("goal", np.array([0.5, 0.0, 0.5]))
    prior = ArmJacobianPrior(sim.built, ee_link="panda_ee_tip")
    u = np.asarray(prior.compute_command(sim.view))[0]
    assert u.shape == (7,)
    assert np.all(np.isfinite(u)) and np.any(np.abs(u) > 1e-3)
    # applying the prior command must reduce EE-goal distance
    ee0 = np.asarray(sim.view.link_position("panda_ee_tip", "panda"))[0]
    d0 = np.linalg.norm(ee0 - [0.5, 0, 0.5])
    for _ in range(10):
        u = np.asarray(prior.compute_command(sim.view))[0]
        sim.apply_robot_cmd(u)
        sim.step()
    ee1 = np.asarray(sim.view.link_position("panda_ee_tip", "panda"))[0]
    assert np.linalg.norm(ee1 - [0.5, 0, 0.5]) < d0


def test_prior_in_solver_rollout():
    """use_priors wiring: the designated sample follows the prior."""
    from mppiisaac_tpu.mppi.config import MPPIConfig
    from mppiisaac_tpu.mppi.solver import MPPIPlanner

    goal = jnp.array([2.0, 2.0])

    def dynamics(st, u, t):
        return st + u * 0.1

    def cost(st, t):
        return jnp.sum((st - goal) ** 2)

    def prior(st, t):
        return 1.0 * (goal - st)

    cfg = MPPIConfig(
        num_samples=32, horizon=8, mppi_mode="simple", sampling_method="random",
        noise_sigma=[[0.3, 0], [0, 0.3]], u_min=[-1], u_max=[1],
        use_priors=True, lambda_=0.1,
    )
    p = MPPIPlanner(cfg, 2, dynamics, cost, prior=prior)
    x = jnp.zeros(2)
    for _ in range(45):
        a = p.command(jnp.broadcast_to(x, (32, 2)))
        x = x + a * 0.1
    assert float(jnp.linalg.norm(x - goal)) < 0.6
