import jax.numpy as jnp
import numpy as np
import pytest

from mppiisaac_tpu.physics import math3d as m3


def test_quat_rotate_matches_matrix():
    rng = np.random.RandomState(0)
    q = m3.quat_normalize(jnp.asarray(rng.randn(32, 4)))
    v = jnp.asarray(rng.randn(32, 3))
    R = m3.quat_to_matrix(q)
    np.testing.assert_allclose(
        m3.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5
    )


def test_quat_mul_compose():
    rng = np.random.RandomState(1)
    qa = m3.quat_normalize(jnp.asarray(rng.randn(8, 4)))
    qb = m3.quat_normalize(jnp.asarray(rng.randn(8, 4)))
    v = jnp.asarray(rng.randn(8, 3))
    lhs = m3.quat_rotate(m3.quat_mul(qa, qb), v)
    rhs = m3.quat_rotate(qa, m3.quat_rotate(qb, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_matrix_quat_roundtrip():
    rng = np.random.RandomState(2)
    q = np.asarray(m3.quat_normalize(jnp.asarray(rng.randn(64, 4))))
    q2 = np.asarray(m3.matrix_to_quat(m3.quat_to_matrix(jnp.asarray(q))))
    # sign ambiguity
    dot = np.abs(np.sum(q * q2, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_axis_angle_90deg():
    q = m3.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(np.pi / 2))
    v = m3.quat_rotate(q, jnp.array([1.0, 0, 0]))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)


def test_euler_roundtrip_and_yaw():
    rpy = jnp.array([0.3, -0.4, 1.2])
    q = m3.quat_from_euler_zyx(*rpy)
    r, p, y = m3.quat_to_euler_zyx(q)
    np.testing.assert_allclose([r, p, y], rpy, atol=1e-6)
    np.testing.assert_allclose(m3.quat_to_yaw(q), 1.2, atol=1e-6)


def test_quat_integrate_constant_omega():
    q = m3.quat_identity()
    w = jnp.array([0.0, 0.0, np.pi])  # half-turn per second
    for _ in range(100):
        q = m3.quat_integrate(q, w, 0.01)
    v = m3.quat_rotate(q, jnp.array([1.0, 0, 0]))
    np.testing.assert_allclose(v, [-1, 0, 0], atol=1e-4)


def test_transforms():
    p = jnp.array([1.0, 2, 3])
    q = m3.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(np.pi / 2))
    pi, qi = m3.transform_inverse(p, q)
    p2, q2 = m3.transform_compose(p, q, pi, qi)
    np.testing.assert_allclose(p2, 0, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(q2)[3]), 1, atol=1e-6)
