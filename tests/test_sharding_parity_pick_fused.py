"""Sharded FUSED-kernel parity on the REAL panda_pick scene (r4 verdict
item 7 / weak #6): the shipped multi-chip config was previously covered only
on mini-gripper scenes because the fused kernel in interpret mode on the full
pick candidate set over H×substeps "needs hours". Shrinking the ROLLOUT
(H=1, rollout_substeps=1) keeps the full scene — every candidate table row,
couple solve, λ carry, world fidelity — while cutting interpret work ~120×.

Marked slow: ~10-20 min on one CPU core. Run with
  python -m pytest tests/test_sharding_parity_pick_fused.py -m slow
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices"),
]

N_DEV = 4
K = 16
H = 1


def test_sharded_fused_parity_real_pick_scene():
    from mppiisaac_tpu.mppi.solver import MPPIPlanner
    from mppiisaac_tpu.parallel.sharding import (
        make_mesh,
        shard_batched_state,
        sharded_command,
    )
    from mppiisaac_tpu.planner.mppi_isaac import MPPIisaacPlanner
    from mppiisaac_tpu.tasks.panda_pick import PandaPickObjective
    from mppiisaac_tpu.utils.config_store import load_config

    cfg = load_config(
        "tasks/panda_pick",
        [
            f"mppi.num_samples={K}",
            f"mppi.horizon={H}",
            "mppi.rollout_fidelity=world",
            "mppi.rollout_substeps=1",
            "mppi.sampling_method=halton",
        ],
    )
    gp = MPPIisaacPlanner(cfg, PandaPickObjective(cfg), randomize=False,
                          use_fused=False)
    fused_factory = gp.fused_factory()

    single = MPPIPlanner(
        gp.cfg.mppi, gp.cfg.nx,
        dynamics=gp.mppi.dynamics, running_cost=gp.mppi.running_cost,
        vis_fn=gp.mppi.vis_fn, fused=fused_factory(K),
    )
    state_K = (gp.sim.state, gp._params_K)
    a1, c1, info1 = jax.jit(single._command_impl)(single.carry, state_K)

    mesh = make_mesh(N_DEV)
    cmd = sharded_command(gp.mppi, mesh, fused_factory=fused_factory)
    a2, c2, info2 = cmd(gp.mppi.carry, shard_batched_state(state_K, mesh))

    costs1 = np.asarray(info1["costs"])
    costs2 = np.asarray(info2["costs"])
    assert costs1.shape == costs2.shape == (K,)
    assert np.isfinite(costs1).all() and np.isfinite(costs2).all()
    np.testing.assert_allclose(costs2, costs1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-4, atol=1e-4)
