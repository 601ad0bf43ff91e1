"""Quaternion / SO(3) / SE(3) math, batched, pure JAX.

Conventions
-----------
* Quaternions are stored ``(x, y, z, w)`` — matching the reference framework's
  actor-root-state layout (``/root/reference`` `isaacgym_wrapper.py:186-199`,
  13-float root state = pos(3) + quat_xyzw(4) + linvel(3) + angvel(3)).
* All functions broadcast over leading batch dimensions.
* Z-up, gravity (0, 0, -9.8) elsewhere (parity with reference
  `isaacgym_wrapper.py:28-29`).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, both xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (xyzw)."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis (...,3) assumed unit; angle (...)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) xyzw → (...,3,3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) → (...,4) xyzw. Branch-free (Shepperd via max trace choice)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # four candidate squared magnitudes (×4)
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    mags = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    best = jnp.argmax(mags, axis=-1)

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    sw = safe_sqrt(qw2) * 0.5
    qw_w = sw
    qw_x = (m21 - m12) / (4 * sw)
    qw_y = (m02 - m20) / (4 * sw)
    qw_z = (m10 - m01) / (4 * sw)

    sx = safe_sqrt(qx2) * 0.5
    qx_x = sx
    qx_w = (m21 - m12) / (4 * sx)
    qx_y = (m01 + m10) / (4 * sx)
    qx_z = (m02 + m20) / (4 * sx)

    sy = safe_sqrt(qy2) * 0.5
    qy_y = sy
    qy_w = (m02 - m20) / (4 * sy)
    qy_x = (m01 + m10) / (4 * sy)
    qy_z = (m12 + m21) / (4 * sy)

    sz = safe_sqrt(qz2) * 0.5
    qz_z = sz
    qz_w = (m10 - m01) / (4 * sz)
    qz_x = (m02 + m20) / (4 * sz)
    qz_y = (m12 + m21) / (4 * sz)

    cand = jnp.stack(
        [
            jnp.stack([qx_x, qx_y, qx_z, qx_w], axis=-1),
            jnp.stack([qy_x, qy_y, qy_z, qy_w], axis=-1),
            jnp.stack([qz_x, qz_y, qz_z, qz_w], axis=-1),
            jnp.stack([qw_x, qw_y, qw_z, qw_w], axis=-1),
        ],
        axis=-2,
    )  # (...,4cand,4)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    return quat_normalize(q)


def quat_from_euler_zyx(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic ZYX (yaw-pitch-roll) Euler → quat xyzw."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler_zyx(q: jnp.ndarray):
    """quat xyzw → (roll, pitch, yaw). Matches reference objectives' use of
    pytorch3d matrix_to_euler_angles for upright terms (`examples/panda/planner.py:30-32`)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2 * (w * x + y * z)
    cosr_cosp = 1 - 2 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2 * (w * z + x * y)
    cosy_cosp = 1 - 2 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def quat_to_yaw(q: jnp.ndarray) -> jnp.ndarray:
    """Batched yaw extraction (parity: reference `mppiisaac/utils/conversions.py:4-11`)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by world-frame angular velocity for dt (exponential map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.maximum(angle, 1e-9)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# SE(3) transforms: (pos (...,3), quat (...,4)) pairs
# ---------------------------------------------------------------------------

def transform_apply(pos, quat, point):
    """x_world = R(quat) @ point + pos."""
    return pos + quat_rotate(quat, point)


def transform_compose(pa, qa, pb, qb):
    """(pa,qa) ∘ (pb,qb): first apply b, then a."""
    return pa + quat_rotate(qa, pb), quat_mul(qa, qb)


def transform_inverse(p, q):
    qi = quat_conjugate(q)
    return -quat_rotate(qi, p), qi
