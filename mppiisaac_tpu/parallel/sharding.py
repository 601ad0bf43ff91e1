"""Multi-chip sample-parallelism: shard K rollouts over a 1-D device mesh.

The reference is single-GPU (SURVEY §2.4); its only parallel axis is K
identical envs inside one PhysX scene. Here the same axis shards across chips:
rollouts are embarrassingly parallel, and the ONLY cross-chip communication in
an MPPI iteration is the softmax-weight reduction over per-sample costs
(SURVEY §5 'long-context' note) — a handful of psums riding the ICI.

Implementation: `shard_map` over Mesh(("k",)). Noise is sampled per-shard by
folding the shard index into the PRNG key; β=min(S), η=Σexp and the weighted
noise sum Σ w_k ε_k become `psum`/`pmin` collectives. Everything else runs
unmodified per shard.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]).reshape(n), ("k",))


def shard_batched_state(state, mesh: Mesh):
    """Place a K-leading batched pytree with its K axis sharded over the mesh.

    Arrays are materialized first: lazily-broadcast inputs otherwise keep a
    replicated XLA sharding that shard_map's in_specs check rejects."""
    sharding = NamedSharding(mesh, P("k"))
    return jax.tree.map(
        lambda x: jax.device_put(jnp.array(x, copy=True), sharding), state
    )


def sharded_command(planner_mppi, mesh: Mesh, fused_factory=None):
    """Build a shard_map'ped version of an MPPIPlanner's command.

    planner_mppi: mppiisaac_tpu.mppi.solver.MPPIPlanner. Returns a function
    (carry, state0_K) -> (action, carry, info) where state0_K's leading K axis
    is sharded over mesh axis "k". The solver's K must divide the mesh size.

    fused_factory: optional ``K_shard -> FusedRollout`` — gives every shard
    the fused Pallas rollout kernel over its K/n lanes (without it the shards
    run the XLA vmap-of-scan path, which is launch-overhead-bound on real
    chips — 140× slower measured, RESULTS round 1). The psum softmax
    reductions are unchanged: the kernel only replaces the per-shard rollout.
    """
    n = mesh.devices.size
    cfg = planner_mppi.cfg
    K = cfg.num_samples
    assert K % n == 0, (K, n)

    # per-shard solver with K/n samples: reuse the same machinery, but
    # replace the global softmax with psum-based collectives.
    import copy

    shard_cfg = copy.copy(cfg)
    shard_cfg.num_samples = K // n
    from ..mppi.solver import MPPIPlanner

    local = MPPIPlanner(
        shard_cfg,
        planner_mppi.nx,
        dynamics=planner_mppi.dynamics,
        running_cost=planner_mppi.running_cost,
        prior=planner_mppi.prior,
        vis_fn=planner_mppi.vis_fn,
        fused=fused_factory(K // n) if fused_factory is not None else None,
        tape_prior=planner_mppi.tape_prior,
    )
    # global softmax: β/η/Σwε reductions inside _command_impl become psums
    local.axis_name = "k"
    local.n_shards = n
    if shard_cfg.sampling_method == "halton":
        # give every shard a distinct slice of the GLOBAL K-point Halton set
        # (per-shard K/n tables + independent shifts would overlay n copies
        # of the same points instead of one low-discrepancy set)
        from ..mppi.sampling import halton as _halton

        local._halton_base = jnp.asarray(
            _halton(K, local._sample_dims, skip=1), jnp.float32
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("k")),
        out_specs=(P(), P(), P("k")),
        # pallas_call outputs carry no varying-mesh-axes annotation; skip the
        # vma check (the out_specs above already pin the sharding)
        check_vma=False,
    )
    def cmd(carry, state0):
        shard_id = jax.lax.axis_index("k")
        if shard_cfg.sampling_method == "halton":
            # same key everywhere → same CP shift; rows differ by table slice
            carry_l = carry
        else:
            carry_l = carry._replace(key=jax.random.fold_in(carry.key, shard_id))
        action, new_carry, info = local._command_impl(carry_l, state0)
        # all shards produce identical U/action thanks to global reductions;
        # return shard 0's copies
        new_carry = new_carry._replace(key=carry.key)  # keep key in sync
        return action, new_carry, {"costs": info["costs"], "vis": info["vis"]}

    repl = NamedSharding(mesh, P())
    # under jit, shard_map inputs are resharded to in_specs automatically
    # (called eagerly it asserts on any sharding mismatch instead)
    cmd_jit = jax.jit(cmd)

    def run(carry, state0_sharded):
        carry = jax.tree.map(lambda x: jax.device_put(x, repl), carry)
        action, new_carry, info = cmd_jit(carry, state0_sharded)
        # advance the key once globally
        new_key, _ = jax.random.split(carry.key)
        return action, new_carry._replace(key=new_key), info

    return run
