"""Solver validation on analytic toy dynamics — independent of the physics
engine (SURVEY §7.2 build step 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.mppi.config import MPPIConfig
from mppiisaac_tpu.mppi.sampling import bspline_interp_matrix, halton, savgol_coeffs
from mppiisaac_tpu.mppi.solver import MPPIPlanner


def test_halton_low_discrepancy():
    pts = halton(512, 6)
    assert pts.shape == (512, 6)
    assert pts.min() > 0 and pts.max() < 1
    # mean of U(0,1) ≈ 0.5, tighter than iid Monte-Carlo at n=512
    np.testing.assert_allclose(pts.mean(0), 0.5, atol=0.02)


def test_bspline_matrix_partition_of_unity():
    P = bspline_interp_matrix(5, 20, 2)
    assert P.shape == (20, 5)
    np.testing.assert_allclose(P.sum(1), 1.0, atol=1e-9)
    # endpoint interpolation (clamped)
    np.testing.assert_allclose(P[0], [1, 0, 0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(P[-1], [0, 0, 0, 0, 1], atol=1e-9)


def test_savgol_preserves_linear():
    c = savgol_coeffs(9, 2)
    x = np.arange(9, dtype=float)
    np.testing.assert_allclose(c @ x, x[4], atol=1e-9)
    np.testing.assert_allclose(c.sum(), 1.0, atol=1e-9)


def _point_mass_planner(mode, method, K=128, H=16, **kw):
    """2D velocity-controlled point mass must reach goal (2, 2)."""
    goal = jnp.array([2.0, 2.0])
    dt = 0.1

    def dynamics(state, u, t):
        return state + u * dt            # state (K,2), u (K,2)

    def running_cost(state, t):
        return jnp.sum((state - goal) ** 2, axis=-1)

    cfg = MPPIConfig(
        num_samples=K,
        horizon=H,
        mppi_mode=mode,
        sampling_method=method,
        noise_sigma=[[0.5, 0.0], [0.0, 0.5]],
        lambda_=0.1,
        u_min=[-1.0],
        u_max=[1.0],
        sample_null_action=True,
        **kw,
    )
    return MPPIPlanner(cfg, nx=2, dynamics=dynamics, running_cost=running_cost), goal, dt


@pytest.mark.parametrize(
    "mode,method",
    [("simple", "random"), ("simple", "halton"), ("halton-spline", "halton")],
)
def test_point_mass_reaches_goal(mode, method):
    planner, goal, dt = _point_mass_planner(mode, method)
    state = jnp.zeros((128, 2))
    x = jnp.zeros(2)
    for _ in range(60):
        a = planner.command(jnp.broadcast_to(x, (128, 2)))
        x = x + a * dt
    assert float(jnp.linalg.norm(x - goal)) < 0.25, x


def test_filter_u_and_updates_run():
    planner, goal, dt = _point_mass_planner(
        "halton-spline", "halton", filter_u=True, update_lambda=True, update_cov=True
    )
    x = jnp.zeros(2)
    for _ in range(30):
        a = planner.command(jnp.broadcast_to(x, (128, 2)))
        x = x + a * dt
    assert np.all(np.isfinite(np.asarray(planner.carry.sigma)))
    assert float(jnp.linalg.norm(x - goal)) < 0.6


def test_command_is_deterministic_given_carry():
    planner, _, _ = _point_mass_planner("simple", "halton")
    st = jnp.zeros((128, 2))
    a1, c1, _ = planner._command(planner.carry, st)
    a2, c2, _ = planner._command(planner.carry, st)
    np.testing.assert_allclose(a1, a2)
    np.testing.assert_allclose(c1.U, c2.U)


def test_update_noise_sigma():
    planner, _, _ = _point_mass_planner("simple", "halton")
    planner.update_noise_sigma([[0.2, 0.0], [0.0, 0.2]])
    np.testing.assert_allclose(np.asarray(planner.carry.sigma), 0.2 * np.eye(2), atol=1e-6)
    planner.command(jnp.zeros((128, 2)))  # recompiles fine


def test_halton_beyond_128_dims():
    """No dimension cap (reference ghalton has none): simple-mode H=30, nu=7
    needs 210 distinct bases — tiling a capped table would correlate noise
    across horizon steps."""
    pts = halton(64, 210)
    assert pts.shape == (64, 210)
    assert pts.min() > 0 and pts.max() < 1
    # distinct bases → columns are not duplicates of each other (the old
    # 128-cap tiled column d and column d+128 identically)
    assert not np.allclose(pts[:, 0], pts[:, 128])
    assert not np.allclose(pts[:, 5], pts[:, 133])
    np.testing.assert_allclose(pts.mean(0), 0.5, atol=0.12)


def test_simple_mode_full_width_table():
    """Solver in simple mode with sample_dims > 128 gets a full-width table."""
    cfg = MPPIConfig(
        num_samples=32, horizon=30, mppi_mode="simple", sampling_method="halton",
        noise_sigma=(np.eye(7) * 0.5).tolist(), u_min=-1.0, u_max=1.0,
    )
    p = MPPIPlanner(cfg, 7, dynamics=lambda s, u, t: s, running_cost=lambda s, t: jnp.zeros(()))
    assert p._sample_dims == 30 * 7
    assert p._halton_base.shape == (32, 210)
