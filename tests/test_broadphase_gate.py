"""Broadphase-gate exactness (r4 verdict item 5 / ADVICE r4): the per-block
`lax.cond` gate (`fused_physics.BROADPHASE_GATE`) claims to change NO numerics
— separated bounding spheres imply every manifold sample has depth < 0, so the
gated-off block contributes exactly zero (penalty force, act mask, impulses,
λ carry). This test runs the SAME fused rollout with the gate monkeypatched
off vs on, on a scene containing both touching pairs (gripper↔ball couple
contact, ball↔plane) and far-separated pairs (a distant ball that gates off),
and asserts bitwise-identical costs. The gate guards ~35% of bench perf
(PROFILE.md r4: 159.7 → 244.9 Hz)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.ops.pallas import fused_physics
from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
from mppiisaac_tpu.physics.step import Engine
from mppiisaac_tpu.runtime.sim import broadcast_state, sample_model_params
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig, build_scene

K, H = 4, 2


@pytest.fixture(scope="module")
def setup():
    specs = [
        ActorSpec(type="robot", name="mini_gripper", urdf_file="mini_gripper",
                  fixed=True, gripper_binarize=True, init_pos=[0.0, 0.0, 0.5]),
        # touching: ball inside the gripper (couple contact) + on no plane
        ActorSpec(type="sphere", name="ball", size=[0.02], mass=0.005,
                  init_pos=[0.0, 0.0, 0.53], friction=1.0),
        # far: gates its blocks OFF every substep (ball↔ball, gripper↔ball2)
        ActorSpec(type="sphere", name="far_ball", size=[0.05], mass=0.1,
                  init_pos=[5.0, 5.0, 0.05], friction=0.5),
    ]
    built = build_scene(specs, SimConfig(dt=0.05, substeps=2))
    engine = Engine(built.scene, use_impulse=True)
    return built, engine


def _cost_fn(scene):
    bi = scene.actor_index("ball")

    def fn(view, t):
        # state- and contact-dependent: catches force/impulse deviations
        p = view.actor_pos("ball")
        cf = view.actor_net_cf("ball")
        return (jnp.abs(p[2] - 0.5) + jnp.abs(p[0]) + jnp.abs(p[1])
                + 0.01 * (jnp.abs(cf[0]) + jnp.abs(cf[1]) + jnp.abs(cf[2])))

    return fn


def _run(built, engine, gate_on):
    old = fused_physics.BROADPHASE_GATE
    fused_physics.BROADPHASE_GATE = gate_on
    try:
        state_K = broadcast_state(built.initial_state(engine), K)
        params_K = sample_model_params(built, engine, K, seed=7)
        rng = np.random.RandomState(3)
        nu = built.cmd_map.nu
        V = jnp.asarray(rng.uniform(-0.5, 0.5, size=(K, H, nu)), jnp.float32)
        fr = FusedRollout(
            built, engine, cost_fn=_cost_fn(built.scene), H=H, K=K,
            vis_body=None, interpret=True, impulse_sweeps=2,
        )
        costs, _ = fr.rollout(state_K, params_K, V)
        return np.asarray(costs)
    finally:
        fused_physics.BROADPHASE_GATE = old


def test_gate_on_off_bitwise_identical(setup):
    built, engine = setup
    c_off = _run(built, engine, gate_on=False)
    c_on = _run(built, engine, gate_on=True)
    assert np.all(np.isfinite(c_on))
    # exactness claim: the gate changes no numerics at all
    np.testing.assert_array_equal(c_on, c_off)


def test_gate_actually_fires(setup):
    """Sanity that the scene exercises the gate both ways: at the initial
    state, the far ball's pair blocks are gated OFF and the gripper↔ball
    blocks are ON (otherwise the parity test is vacuous)."""
    built, engine = setup
    from mppiisaac_tpu.ops.pallas.fused_physics import block_gate, pair_blocks

    state = built.initial_state(engine)
    blocks, _ = pair_blocks(built.scene, engine.tables)
    pos = {b: state.body_pos[b] for b in range(built.scene.nbody)}
    far_b = built.scene.body_offset[built.scene.actor_index("far_ball")]
    on, off = 0, 0
    for blk in blocks:
        g = bool(block_gate(built.scene, blk, pos))
        if far_b in (blk["ba"], blk["bb"]) and blk["has_b"]:
            assert not g, f"far-ball block unexpectedly live: {blk['kind']}"
            off += 1
        elif g:
            on += 1
    assert on > 0 and off > 0
