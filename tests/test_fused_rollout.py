"""Fused Pallas rollout vs the XLA engine: identical physics, identical costs
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.ops.pallas import lanes as L
from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
from mppiisaac_tpu.physics.step import Engine
from mppiisaac_tpu.planner.objective import Objective
from mppiisaac_tpu.planner.observables import SimView
from mppiisaac_tpu.runtime.sim import broadcast_state, sample_model_params
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig, build_scene


class TinyObjective(Objective):
    """Robot-to-block + block height + robot contact force, in both forms."""

    weights = {"rb": 1.0, "h": 2.0, "cf": 0.05}

    def compute_cost(self, view: SimView):
        r = view.actor_q("point_robot")[..., :2]
        block = view.actor_position("block")
        cf = view.actor_contact_forces("point_robot")
        w = self.weights
        return (
            w["rb"] * jnp.linalg.norm(r - block[..., :2], axis=-1)
            + w["h"] * jnp.abs(block[..., 2])
            + w["cf"] * jnp.sum(jnp.abs(cf), axis=(-1, -2))
        )

    def kernel_cost(self, scene):
        def fn(view, t):
            q = view.actor_q("point_robot")
            block = view.actor_pos("block")
            cf = view.actor_net_cf("point_robot")
            w = self.weights
            dx = q[0] - block[0]
            dy = q[1] - block[1]
            return (
                w["rb"] * jnp.sqrt(dx * dx + dy * dy + 1e-12)
                + w["h"] * jnp.abs(block[2])
                + w["cf"] * (jnp.abs(cf[0]) + jnp.abs(cf[1]) + jnp.abs(cf[2]))
            )

        return fn


@pytest.fixture(scope="module")
def setup():
    specs = [
        ActorSpec(type="robot", name="point_robot", urdf_file="point_robot", fixed=True),
        # sphere block keeps the interpret-mode candidate count small (a
        # box-box pair alone adds 104 manifold samples → minutes of interpret
        # compile); bb equivalence is covered by the physics-path tests
        ActorSpec(type="sphere", name="block", size=[0.15], mass=1.0,
                  init_pos=[0.8, 0.0, 0.2], friction=0.6),
        ActorSpec(type="sphere", name="goal", size=[0.1], fixed=True,
                  collision=False, gravity=False, init_pos=[2.0, 2.0, 0.5]),
    ]
    built = build_scene(specs, SimConfig(dt=0.05, substeps=2))
    # use_impulse=False: the fused kernel implements the penalty-only model;
    # the world engine layers the free-body impulse pass on top (documented
    # planner-model/world fidelity gap)
    engine = Engine(built.scene, use_impulse=False)
    return built, engine


def test_fused_matches_xla(setup):
    built, engine = setup
    K, H = 8, 3
    nu = built.cmd_map.nu
    obj = TinyObjective()

    state0 = built.initial_state(engine)
    state_K = broadcast_state(state0, K)
    params_K = sample_model_params(built, engine, K, seed=123)

    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.uniform(-1, 1, size=(K, H, nu)), jnp.float32)

    # --- XLA reference rollout ---
    def rollout_one(st, pr, V_k):
        def body(s, u):
            s = s._replace(dof_target=built.cmd_map.apply(u))
            s = engine.step(s, pr)
            return s, obj.compute_cost(SimView(built, s))

        _, costs = jax.lax.scan(body, st, V_k)
        return costs

    costs_ref = jax.vmap(rollout_one)(state_K, params_K, V)     # (K,H)

    # --- fused kernel (interpret mode), impulse sweeps off → EXACT match of
    # the penalty-only engine ---
    fused = FusedRollout(
        built, engine, cost_fn=obj.kernel_cost(built.scene), H=H, K=K,
        vis_body=None, interpret=True, impulse_sweeps=0,
    )
    costs_f, vis = fused.rollout(state_K, params_K, V)

    np.testing.assert_allclose(
        np.asarray(costs_f), np.asarray(costs_ref), rtol=2e-3, atol=2e-3
    )


def test_fused_impulse_behavioral(setup):
    """With in-kernel GS impulse sweeps on, the fused physics must
    qualitatively track the world engine (Jacobi impulse pass): the free block
    settles at the same height."""
    built, _ = setup
    from mppiisaac_tpu.physics.step import Engine as Eng

    engine_w = Eng(built.scene, use_impulse=True)
    K, H = 4, 6
    nu = built.cmd_map.nu
    obj = TinyObjective()
    state_K = broadcast_state(built.initial_state(engine_w), K)
    params_K = sample_model_params(built, engine_w, K, seed=5)
    V = jnp.zeros((K, H, nu))

    def roll(st, pr, V_k):
        def body(s, u):
            s = s._replace(dof_target=built.cmd_map.apply(u))
            s = engine_w.step(s, pr)
            return s, s.root_pos[built.scene.actor_index("block"), 2]

        _, z = jax.lax.scan(body, st, V_k)
        return z

    z_ref = jax.vmap(roll)(state_K, params_K, V)

    class ZObj(TinyObjective):
        def kernel_cost(self, scene):
            ai = scene.actor_index("block")

            def fn(view, t):
                return view.actor_pos("block")[2]

            return fn

    fused = FusedRollout(
        built, engine_w, cost_fn=ZObj().kernel_cost(built.scene), H=H, K=K,
        vis_body=None, interpret=True, impulse_sweeps=2,
    )
    z_fused, _ = fused.rollout(state_K, params_K, V)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_ref), atol=0.02)


def test_fused_vis_trajectory(setup):
    built, engine = setup
    K, H = 4, 2
    nu = built.cmd_map.nu
    obj = TinyObjective()
    state_K = broadcast_state(built.initial_state(engine), K)
    params_K = sample_model_params(built, engine, K, seed=1)
    V = jnp.zeros((K, H, nu))
    vis_body = built.scene.body_index("base_link")
    fused = FusedRollout(
        built, engine, cost_fn=obj.kernel_cost(built.scene), H=H, K=K,
        vis_body=vis_body, interpret=True,
    )
    costs, vis = fused.rollout(state_K, params_K, V)
    assert vis.shape == (H, K, 3)
    assert np.all(np.isfinite(np.asarray(vis)))
