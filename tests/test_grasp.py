"""Grasp coupling: articulated↔free two-way contact (the panda_pick flagship
capability, reference `examples/panda_pick/planner.py:24-53`).

World engine: implicit couple-contact forces in the velocity solve +
warm-started Jacobi impulse pass + stiction snap (physics/stacked.py,
physics/contact.py). Fused kernel: the same implicit couple solve + two-way GS
sweeps (ops/pallas/fused_physics.py). Both must (a) hold a gram-scale object
against gravity in a closed gripper, and (b) agree with each other — this is
the impulses-ON equivalence test the round-1 parity suite lacked."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.physics.step import Engine
from mppiisaac_tpu.runtime.sim import Simulation, broadcast_state, sample_model_params
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig, build_scene


def _specs():
    return [
        ActorSpec(type="robot", name="mini_gripper", fixed=True,
                  gripper_binarize=True, init_pos=[0.0, 0.0, 0.5]),
        # sphere object keeps interpret-mode candidate counts tractable
        ActorSpec(type="sphere", name="ball", size=[0.02], mass=0.005,
                  init_pos=[0.0, 0.0, 0.53], friction=1.0),
    ]


@pytest.fixture(scope="module")
def sim():
    s = Simulation(SimConfig(dt=0.05, substeps=2), _specs(), num_envs=1)
    # fingers open
    ds = np.zeros((2, 2), np.float32)
    ds[:, 0] = 0.034
    s.set_dof_state(ds)
    return s


def test_grasp_holds_against_gravity(sim):
    """Close the gripper on the ball, then keep holding: the ball must not
    fall (an unheld ball free-falls ~1.2 m in 0.5 s)."""
    sim.reset_to_initial_poses()
    ds = np.zeros((2, 2), np.float32)
    ds[:, 0] = 0.034
    sim.set_dof_state(ds)
    u = np.array([-1.0, -1.0], np.float32)   # binarized: close
    sim.apply_robot_cmd(u)
    for _ in range(20):                       # 1.0 s
        sim.step()
    ball_z = float(np.asarray(sim.get_actor_position_by_name("ball"))[0][2])
    q = np.asarray(sim.state.q[0])
    # fingers reached the ball surface (not fully closed through it)
    assert q[0] > 0.015 and q[1] > 0.015, q
    assert abs(ball_z - 0.53) < 0.03, f"ball fell/ejected: z={ball_z}"


def test_grasp_open_releases(sim):
    sim.reset_to_initial_poses()
    ds = np.zeros((2, 2), np.float32)
    ds[:, 0] = 0.034
    sim.set_dof_state(ds)
    sim.apply_robot_cmd(np.array([-1.0, -1.0], np.float32))
    for _ in range(10):
        sim.step()
    sim.apply_robot_cmd(np.array([1.0, 1.0], np.float32))   # open
    for _ in range(10):                       # 0.5 s of free fall
        sim.step()
    ball_z = float(np.asarray(sim.get_actor_position_by_name("ball"))[0][2])
    # released → free-fell to the ground plane (rest height ≈ its radius)
    assert ball_z < 0.1, f"ball not released: z={ball_z}"


def test_fused_grasp_matches_world():
    """Impulses ON in BOTH paths (the round-1 parity test ran the engine with
    use_impulse=False — precisely excluding the physics grasping lives in).
    The fused kernel's grasp trajectory must track the world engine."""
    from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout

    built = build_scene(_specs(), SimConfig(dt=0.05, substeps=2))
    engine = Engine(built.scene, use_impulse=True)
    K, H = 4, 8
    nu = built.cmd_map.nu
    st = built.initial_state(engine)
    st = st._replace(q=jnp.full_like(st.q, 0.034))
    st = engine.refresh(st)
    state_K = broadcast_state(st, K)
    params_K = sample_model_params(built, engine, K, seed=3)
    V = jnp.full((K, H, nu), -1.0, jnp.float32)   # close the whole horizon

    ai_ball = built.scene.actor_index("ball")

    def roll(s, pr, V_k):
        def body(s2, u):
            s2 = s2._replace(dof_target=built.cmd_map.apply(u))
            s2 = engine.step(s2, pr)
            return s2, s2.root_pos[ai_ball, 2]

        _, z = jax.lax.scan(body, s, V_k)
        return z

    z_world = np.asarray(jax.vmap(roll)(state_K, params_K, V))

    def zcost(scene):
        def fn(view, t):
            return view.actor_pos("ball")[2]

        return fn

    fused = FusedRollout(
        built, engine, cost_fn=zcost(built.scene), H=H, K=K,
        vis_body=None, interpret=True, impulse_sweeps=2,
    )
    z_fused, _ = fused.rollout(state_K, params_K, V)
    z_fused = np.asarray(z_fused)

    # both paths HOLD the ball (no free fall: 0.4 s → 0.78 m drop if dropped)
    assert np.all(z_world[:, -1] > 0.45), z_world[:, -1]
    assert np.all(z_fused[:, -1] > 0.45), z_fused[:, -1]
    # and agree quantitatively
    np.testing.assert_allclose(z_fused, z_world, atol=0.03)
