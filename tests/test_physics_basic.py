"""Hermetic physics-engine unit tests against analytic solutions
(SURVEY §4 'lesson for the build')."""
import jax
import jax.numpy as jnp
import numpy as np

from mppiisaac_tpu.physics import (
    Engine,
    SceneModel,
    build_articulation,
    parse_urdf,
    primitive_articulation,
)
from mppiisaac_tpu.physics.urdf import GEOM_SPHERE, GEOM_BOX


def make_engine(actors, names=None, ground=True, dt=0.01, substeps=1, gravity=-9.8):
    scene = SceneModel(
        actors=actors,
        actor_names=names or [a.name for a in actors],
        ground=ground,
        dt=dt,
        substeps=substeps,
        gravity=np.array([0.0, 0.0, gravity]),
    )
    return Engine(scene)


def test_free_fall():
    ball = primitive_articulation("ball", GEOM_SPHERE, [0.1], mass=2.0)
    eng = make_engine([ball], ground=False, dt=0.01)
    st = eng.initial_state()
    st = st._replace(root_pos=jnp.array([[0.0, 0.0, 10.0]]))
    step = jax.jit(eng.step)
    for _ in range(50):
        st = step(st)
    t = 0.5
    # semi-implicit Euler: z = z0 - g*dt^2*(1+2+...+n) = z0 - g dt^2 n(n+1)/2
    expected = 10.0 - 9.8 * 0.01 * 0.01 * 50 * 51 / 2
    np.testing.assert_allclose(st.root_pos[0, 2], expected, atol=1e-3)
    np.testing.assert_allclose(st.root_linvel[0, 2], -9.8 * 0.5, atol=1e-2)
    # body cache matches root
    np.testing.assert_allclose(st.body_pos[0], st.root_pos[0], atol=1e-6)


def test_sphere_rests_on_plane():
    ball = primitive_articulation("ball", GEOM_SPHERE, [0.1], mass=1.0)
    eng = make_engine([ball], ground=True, dt=0.01)
    st = eng.initial_state()
    st = st._replace(root_pos=jnp.array([[0.0, 0.0, 0.12]]))
    step = jax.jit(eng.step)
    for _ in range(200):
        st = step(st)
    # rests near surface (compliant penetration ≤ ~1 cm) and supports weight
    assert 0.05 < float(st.root_pos[0, 2]) < 0.11
    np.testing.assert_allclose(float(st.root_linvel[0, 2]), 0.0, atol=1e-2)
    np.testing.assert_allclose(float(st.net_contact_force[0, 2]), 9.8, rtol=0.1)


PENDULUM_URDF = """
<robot name="pendulum">
  <link name="base"/>
  <link name="arm">
    <inertial>
      <origin xyz="0 0 -1.0"/>
      <mass value="1.0"/>
      <inertia ixx="1e-6" iyy="1e-6" izz="1e-6" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/>
    <child link="arm"/>
    <origin xyz="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-10" upper="10" effort="1000" velocity="1000"/>
  </joint>
</robot>
"""


def test_pendulum_period():
    spec = parse_urdf(PENDULUM_URDF)
    art = build_articulation(spec, fixed_base=True, dof_mode="none")
    eng = make_engine([art], ground=False, dt=0.002)
    st = eng.initial_state()
    st = st._replace(q=jnp.array([0.05]))  # small angle
    step = jax.jit(eng.step)
    # record a half period: point-mass pendulum, T = 2π sqrt(l/g), l=1
    T = 2 * np.pi * np.sqrt(1.0 / 9.8)
    n_half = int(round(T / 2 / 0.002))
    for _ in range(n_half):
        st = step(st)
    # after half a period the angle should be ≈ -0.05
    np.testing.assert_allclose(float(st.q[0]), -0.05, atol=0.006)


def test_pendulum_energy_conservation():
    spec = parse_urdf(PENDULUM_URDF)
    art = build_articulation(spec, fixed_base=True, dof_mode="none")
    eng = make_engine([art], ground=False, dt=0.001)
    st = eng.initial_state()
    st = st._replace(q=jnp.array([1.0]))
    step = jax.jit(eng.step)

    def energy(s):
        # com height: joint at origin, com 1m below along arm
        theta = float(s.q[0])
        h = -np.cos(theta)
        v = float(s.qd[0])  # com speed = l * qd
        return 9.8 * h + 0.5 * v * v

    e0 = energy(st)
    for _ in range(1000):
        st = step(st)
    e1 = energy(st)
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05


def test_double_pendulum_mass_matrix_symmetry():
    urdf = """
    <robot name="dp">
      <link name="base"/>
      <link name="l1">
        <inertial><origin xyz="0 0 -0.5"/><mass value="1.0"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
      </link>
      <link name="l2">
        <inertial><origin xyz="0 0 -0.5"/><mass value="0.7"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
      </link>
      <joint name="j1" type="revolute">
        <parent link="base"/><child link="l1"/><origin xyz="0 0 0"/>
        <axis xyz="0 1 0"/><limit lower="-10" upper="10" effort="100" velocity="100"/>
      </joint>
      <joint name="j2" type="revolute">
        <parent link="l1"/><child link="l2"/><origin xyz="0 0 -1"/>
        <axis xyz="0 1 0"/><limit lower="-10" upper="10" effort="100" velocity="100"/>
      </joint>
    </robot>
    """
    from mppiisaac_tpu.physics.dynamics import (
        build_actor_masks,
        mass_matrix,
        motion_subspaces,
        spatial_inertia_world,
        DynInputs,
    )
    from mppiisaac_tpu.physics.kinematics import fk_actor, joint_world_frames
    from mppiisaac_tpu.physics.math3d import quat_to_matrix

    spec = parse_urdf(urdf)
    art = build_articulation(spec, fixed_base=True, dof_mode="none")
    masks = build_actor_masks(art)
    q = jnp.array([0.3, -0.7])
    qd = jnp.zeros(2)
    p, qq, lv, av = fk_actor(
        art,
        jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), jnp.zeros(3), jnp.zeros(3),
        q, qd,
    )
    anchors, axes = joint_world_frames(art, p, qq)
    din = DynInputs(p, qq, lv, av, anchors, axes)
    R = quat_to_matrix(qq)
    com_w = p + jnp.einsum("bij,bj->bi", R, jnp.asarray(art.com, jnp.float32))
    Iw = spatial_inertia_world(jnp.asarray(art.mass, jnp.float32), com_w, R, jnp.asarray(art.inertia, jnp.float32))
    S = motion_subspaces(art, masks, din)
    M = np.asarray(mass_matrix(art, masks, S, Iw))
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    evals = np.linalg.eigvalsh(M)
    assert evals.min() > 0
    # analytic check for the planar double pendulum (point masses at joints' ends):
    # M11 = m1 l1² + m2 (l1² + l2² + 2 l1 l2 cos q2) + I-terms
    m1, m2, l1, l2 = 1.0, 0.7, 1.0, 1.0
    c2 = np.cos(-0.7)
    M11 = m1 * 0.25 + m2 * (1 + 0.25 + 2 * 0.5 * c2) + 0.01 + 0.01
    np.testing.assert_allclose(M[0, 0], M11, rtol=1e-3)


def test_vmap_determinism():
    """The reference's test_body_force analog: identical envs must evolve
    identically under vmap (600 envs — `test_isaacgym_wrapper.py:18-35`)."""
    ball = primitive_articulation("ball", GEOM_SPHERE, [0.1], mass=1.0)
    box = primitive_articulation("box", GEOM_BOX, [0.2, 0.2, 0.2], mass=2.0)
    eng = make_engine([ball, box], ground=True, dt=0.02)
    st = eng.initial_state()
    st = st._replace(
        root_pos=jnp.array([[0.0, 0.0, 0.3], [0.8, 0.0, 0.6]]),
    )
    K = 600
    batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), st)
    params = eng.default_params()
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), params)
    step = jax.jit(jax.vmap(eng.step))
    for _ in range(25):
        batched = step(batched, bparams)
    # tolerance: XLA:CPU SIMD remainder lanes round slightly differently than
    # full vector lanes, so "identical" envs drift by ~1e-5 over 25 contact
    # steps; on TPU the replication is exact
    rp = np.asarray(batched.root_pos)
    np.testing.assert_allclose(rp, np.broadcast_to(rp[:1], rp.shape), atol=2e-4)
    ncf = np.asarray(batched.net_contact_force)
    np.testing.assert_allclose(ncf, np.broadcast_to(ncf[:1], ncf.shape), atol=5e-2)
    assert np.all(np.isfinite(rp))
