"""QUANTIFIED fused-kernel vs world-engine parity in impulse mode on a grasp
scene (round-2 verdict item 8: round 1/2 only had a qualitative 'tracks'
check).

Scene: mini_gripper_rail (prismatic x-rail + 2 position-drive fingers) grasps
a free ball and transports it ~1 s. The same control tape runs through
  (a) the world engine (physics/stacked.py + contact.impulse_contact_pass,
      16 impulse iterations — the converged reference), and
  (b) the fused Pallas kernel at world fidelity (vector cone + warm start +
      stiction snap) with its world sweep count (8),
and the ball-position divergence is asserted step-by-step.

TOLERANCE (documented, tracked in RESULTS_r3.md): ≤ 2 cm at every step of a
1 s transport, ≤ 1 cm at the end. The residual gap is the GS-sweep count (8
vs 16) and the kernel's per-link Ψ Jacobi splitting; both converge toward the
same fixed point, so divergence shows up as a lag, not a drift."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.ops.pallas.fused_rollout import FusedRollout
from mppiisaac_tpu.physics.step import Engine
from mppiisaac_tpu.runtime.sim import broadcast_state, sample_model_params
from mppiisaac_tpu.scene.actor import ActorSpec
from mppiisaac_tpu.scene.builder import SimConfig, build_scene

DT, SUBSTEPS = 0.04, 2
H_CAPTURE, H_MOVE = 8, 25          # 0.32 s capture + 1.0 s transport
SWEEPS = 8                          # FusedWorldStep's world sweep count


@pytest.fixture(scope="module")
def grasp_setup():
    specs = [
        ActorSpec(type="robot", name="grip", urdf_file="mini_gripper_rail",
                  fixed=True, gravity=False, gripper_binarize=True,
                  init_pos=[0.0, 0.0, 0.5]),
        ActorSpec(type="sphere", name="ball", size=[0.02], mass=0.005,
                  init_pos=[0.0, 0.0, 0.53], friction=1.0),
    ]
    built = build_scene(specs, SimConfig(dt=DT, substeps=SUBSTEPS))
    engine = Engine(built.scene, use_impulse=True)
    return built, engine


def _tape(built):
    """(H, nu) grasp-then-slide control tape."""
    nu = built.cmd_map.nu
    V = np.zeros((H_CAPTURE + H_MOVE, nu), np.float32)
    V[:, 1] = -1.0                 # fingers closed throughout (binarized)
    V[:, 2] = -1.0
    V[H_CAPTURE:, 0] = 0.8         # rail velocity: 0.8 m/s for 1 s
    return jnp.asarray(V)


def test_grasp_transport_divergence_quantified(grasp_setup):
    built, engine = grasp_setup
    H = H_CAPTURE + H_MOVE
    V = _tape(built)
    bi = built.scene.actor_index("ball")

    # --- (a) world engine, converged impulse pass ---
    st = built.initial_state(engine)
    pr1 = jax.tree.map(lambda x: x[0], sample_model_params(built, engine, 1, seed=3))

    def w_body(s, u):
        s = s._replace(dof_target=built.cmd_map.apply(u, s.q))
        s = engine.step(s, pr1)
        return s, s.root_pos[bi]

    _, ball_w = jax.lax.scan(w_body, st, V)
    ball_w = np.asarray(ball_w)                       # (H, 3)
    # sanity: the world transport actually carried the ball ~0.8 m in x
    assert ball_w[-1, 0] > 0.55, f"world transport failed: {ball_w[-1]}"

    # --- (b) fused kernel, world fidelity, matched-world sweep count ---
    K = 8

    def ball_cost(view, t):
        # trajectory rides the vis channel; cost is unused
        return view.actor_pos("ball")[0] * 0.0

    fused = FusedRollout(
        built, engine, cost_fn=ball_cost, H=H, K=K,
        vis_body=built.scene.body_offset[bi],          # ball root body
        interpret=True, impulse_sweeps=SWEEPS, world_fidelity=True,
    )
    state_K = broadcast_state(built.initial_state(engine), K)
    params_K = sample_model_params(built, engine, K, seed=3)
    params_K = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], x.shape), params_K)
    V_K = jnp.broadcast_to(V[None], (K, H, V.shape[-1]))
    _, vis = fused.rollout(state_K, params_K, V_K)     # vis (H, K, 3)
    ball_f = np.asarray(vis[:, 0, :], np.float64)      # lane 0

    div = np.linalg.norm(ball_f - ball_w, axis=1)
    # vis rides bf16 (display channel): ~0.4% relative quantization on a
    # ~0.5-0.8 m coordinate adds ~3-4 mm of apparent divergence
    assert div.max() < 0.02, f"max divergence {div.max():.4f} m at step {div.argmax()}"
    assert div[-1] < 0.01, f"end divergence {div[-1]:.4f} m"
    # and the fused transport also carried the ball
    assert ball_f[-1, 0] > 0.55, ball_f[-1]
