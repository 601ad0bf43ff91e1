"""Multi-chip sample sharding over an 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8 — SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_sharded_command_matches_semantics():
    from mppiisaac_tpu.mppi.config import MPPIConfig
    from mppiisaac_tpu.mppi.solver import MPPIPlanner
    from mppiisaac_tpu.parallel.sharding import (
        make_mesh,
        shard_batched_state,
        sharded_command,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    goal = jnp.array([2.0, 2.0])

    def dynamics(st, u, t):
        return st + u * 0.1

    def cost(st, t):
        return jnp.sum((st - goal) ** 2)

    cfg = MPPIConfig(
        num_samples=64, horizon=8, mppi_mode="simple", sampling_method="random",
        noise_sigma=[[0.4, 0], [0, 0.4]], u_min=[-1], u_max=[1], lambda_=0.1,
    )
    planner = MPPIPlanner(cfg, 2, dynamics, cost)
    mesh = make_mesh(8)
    cmd = sharded_command(planner.mppi if hasattr(planner, "mppi") else planner, mesh)

    state = shard_batched_state(jnp.zeros((64, 2)), mesh)
    carry = planner.carry
    x = jnp.zeros(2)
    for _ in range(40):
        action, carry, info = cmd(carry, shard_batched_state(jnp.broadcast_to(x, (64, 2)), mesh))
        x = x + action[0] * 0.1
    # the sharded solver must still drive the point mass to the goal
    assert float(jnp.linalg.norm(x - goal)) < 0.5, x
    # per-shard costs come back sharded over "k"
    assert info["costs"].shape == (64,)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
