"""Tape-prior mechanics (mppi/solver.py `tape_prior`): a time-indexed (H, nu)
control tape injected as one sample — the fused-kernel-compatible prior form
(vs the reference's closed-loop fabrics priors, `mppi_isaac.py:38-41`).
Covers: phase clock in the carry, tape-sample injection winning the softmax,
and the QuadrupedGaitPrior's goal steering geometry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.mppi.config import MPPIConfig
from mppiisaac_tpu.mppi.solver import MPPIPlanner


def _tape_planner(tape_fn, K=64, H=8, zero_cost=False, **kw):
    dt = 0.1
    goal = jnp.array([2.0, 0.0])

    def dynamics(state, u, t):
        return state + u * dt

    def running_cost(state, t):
        if zero_cost:
            return jnp.zeros(())
        return jnp.sum((state - goal) ** 2, axis=-1)

    kw.setdefault("sample_null_action", True)
    cfg = MPPIConfig(
        num_samples=K,
        horizon=H,
        mppi_mode="simple",
        sampling_method="random",
        noise_sigma=kw.pop("noise_sigma", [[0.05, 0.0], [0.0, 0.05]]),
        lambda_=0.05,
        u_min=[-1.0],
        u_max=[1.0],
        use_priors=True,
        **kw,
    )
    return MPPIPlanner(
        cfg, nx=2, dynamics=dynamics, running_cost=running_cost, tape_prior=tape_fn
    )


def test_carry_t0_advances():
    planner = _tape_planner(lambda st, t0: jnp.zeros((8, 2)))
    assert int(planner.carry.t0) == 0
    state = jnp.zeros((64, 2))
    planner.command(state)
    planner.command(state)
    assert int(planner.carry.t0) == 2 * planner.cfg.u_per_command
    planner.reset()
    assert int(planner.carry.t0) == 0


def test_tape_sample_wins_softmax():
    # noise is tiny (sigma 0.05) so random samples barely move; the tape
    # drives straight at the goal — U must be dragged strongly toward it
    def tape_fn(state_single, t0):
        return jnp.broadcast_to(jnp.array([1.0, 0.0]), (8, 2))

    planner = _tape_planner(tape_fn)
    a = planner.command(jnp.zeros((64, 2)))
    assert float(a[0]) > 0.5, a  # pulled toward the tape's +x unit drive
    assert abs(float(a[1])) < 0.3, a


def test_tape_is_time_indexed():
    # tape = +1 for even global steps, −1 for odd: with the sampling mean
    # blended fully onto the tape (prior_blend=1) and near-zero noise, the
    # executed action must flip sign with the carry's step clock — phase
    # continuity across commands
    def tape_fn(state_single, t0):
        sign = jnp.where((t0 + jnp.arange(8)) % 2 == 0, 1.0, -1.0)
        return jnp.stack([sign, jnp.zeros(8)], axis=-1)

    # neutral cost + no null sample isolates the blend pull itself (with a
    # task cost, whether the solver FOLLOWS an alternating tape is a cost
    # question, not a mechanics question)
    planner = _tape_planner(
        tape_fn, prior_blend=1.0, zero_cost=True, sample_null_action=False,
        noise_abs_cost=True, noise_sigma=[[0.25, 0.0], [0.0, 0.25]],
    )
    s = jnp.zeros((64, 2))
    a0 = planner.command(s)
    a1 = planner.command(s)
    assert float(a0[0]) > 0.5, a0
    assert float(a1[0]) < -0.2, a1  # the tape flipped phase


def test_prior_blend_centers_sampling():
    # blend=1, neutral cost: U_new ≈ tape regardless of the cost landscape
    tape = jnp.broadcast_to(jnp.array([0.7, -0.4]), (8, 2))
    planner = _tape_planner(
        lambda st, t0: tape, prior_blend=1.0, zero_cost=True,
        sample_null_action=False, noise_abs_cost=True,
        noise_sigma=[[0.25, 0.0], [0.0, 0.25]],
    )
    a = np.asarray(planner.command(jnp.zeros((64, 2))))
    # the softmax shades the pull (small-|eps| samples weigh more under
    # noise_abs_cost), so assert direction + most of the magnitude
    assert a[0] > 0.7 * 0.7 and a[0] <= 0.7 + 0.1, a
    assert a[1] < -0.4 * 0.7 and a[1] >= -0.4 - 0.1, a


def test_quadruped_gait_prior_geometry():
    """Tape steers toward the goal: facing the goal → symmetric strides;
    goal to the left → left legs shorten (differential stride); at the goal →
    zero tape. Uses the real anymal scene for the view."""
    from mppiisaac_tpu.planner.observables import SimView
    from mppiisaac_tpu.planner.priors import QuadrupedGaitPrior
    from mppiisaac_tpu.runtime.sim import Simulation
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config("tasks/anymal")
    sim = Simulation(cfg.isaacgym, cfg.actors, num_envs=1,
                     init_positions=cfg.initial_actor_positions)
    prior = QuadrupedGaitPrior(H=12, dt=0.1)
    # the raw scene leaves the goal marker at its yaml pose; pin it straight
    # ahead of the base (base starts at [0, 2], yaw 0)
    g = np.asarray(sim.view.actor_position("goal"))[0].copy()
    sim.set_actor_position_by_name("goal", [2.0, 2.0, g[2]])
    view = SimView(sim.built, jax.tree.map(lambda x: x[0], sim.state))

    tape = np.asarray(prior.tape(view, 0))
    assert tape.shape == (12, 12)
    assert np.isfinite(tape).all()
    # goal [2,2] from base [0,2]: straight ahead (+x, yaw 0) → active + symmetric
    hfe = tape[:, 1::3]                    # (H, 4) legs LF RF LH RH
    assert np.abs(hfe).max() > 0.3
    np.testing.assert_allclose(hfe[:, 0], hfe[:, 3], atol=1e-5)  # LF == RH (diagonal pair)
    np.testing.assert_allclose(hfe[:, 0], -hfe[:, 1], atol=1e-5)  # RF antiphase
    np.testing.assert_allclose(np.abs(hfe[:, 0]), np.abs(hfe[:, 1]), atol=1e-5)  # symmetric stride

    # goal 45° to the left → left legs (LF, LH) shorter stride than right
    sim.set_actor_position_by_name("goal", [2.0, 4.0, g[2]])
    view = SimView(sim.built, jax.tree.map(lambda x: x[0], sim.state))
    tape_l = np.asarray(prior.tape(view, 0))
    hfe_l = tape_l[:, 1::3]
    assert np.abs(hfe_l[:, 0]).max() < np.abs(hfe_l[:, 1]).max()  # LF < RF

    # at the goal → tape tapers to zero
    sim.set_actor_position_by_name("goal", [0.0, 2.0, g[2]])
    view = SimView(sim.built, jax.tree.map(lambda x: x[0], sim.state))
    tape_0 = np.asarray(prior.tape(view, 0))
    assert np.abs(tape_0).max() < 1e-5
