"""Component ("lanes") math for Pallas physics kernels.

Inside the fused rollout kernel every physical scalar is an (8,128) f32 tile
holding 1024 MPPI samples (samples live in VPU lanes). Vectors are python
3-tuples of tiles, quaternions 4-tuples (x,y,z,w) — so all of math3d.py's
operations become straight-line VPU instructions with zero per-op XLA launch
overhead. Static model parameters enter as python floats (broadcast free).
"""
from __future__ import annotations

import jax.numpy as jnp


# ---- 3-vectors: tuples (x, y, z) of tiles or floats ----

def v3(x=0.0, y=0.0, z=0.0):
    return (x, y, z)


def add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def norm3(a, eps=1e-9):
    return jnp.sqrt(dot3(a, a) + eps)


def fma3(a, b, s):
    """a + b*s."""
    return (a[0] + b[0] * s, a[1] + b[1] * s, a[2] + b[2] * s)


# ---- quaternions: tuples (x, y, z, w) ----

def qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def qconj(q):
    return (-q[0], -q[1], -q[2], q[3])


def qrot(q, v):
    """Rotate 3-tuple v by quaternion q."""
    u = (q[0], q[1], q[2])
    w = q[3]
    t = scale3(cross3(u, v), 2.0)
    return add3(add3(v, scale3(t, w)), cross3(u, t))


def qrot_inv(q, v):
    return qrot(qconj(q), v)


def q_axis_angle(axis, angle):
    """axis: static unit 3-tuple of floats (or tiles); angle: tile."""
    half = angle * 0.5
    s = jnp.sin(half)
    return (axis[0] * s, axis[1] * s, axis[2] * s, jnp.cos(half))


def qnormalize(q, eps=1e-12):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3] + eps)
    inv = 1.0 / n
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def qintegrate(q, w, dt):
    """Integrate by world angular velocity 3-tuple for dt (exponential map),
    mirroring math3d.quat_integrate."""
    angle = norm3(w)
    inv = 1.0 / jnp.maximum(angle, 1e-9)
    axis = scale3(w, inv)
    dq = q_axis_angle(axis, angle * dt)
    return qnormalize(qmul(dq, q))


def q_to_R(q):
    """3x3 rotation as nested tuples R[i][j]."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


_PI = 3.14159265358979


def atan_poly(z):
    """Minimax atan on [-1,1] (~1e-6 rad) — Mosaic has no atan lowering."""
    a = z * z
    return z * (
        0.99997726
        + a * (-0.33262347 + a * (0.19354346 + a * (-0.11643287 + a * (0.05265332 + a * (-0.01172120)))))
    )


def atan2_tiles(y, x, eps=1e-12):
    """Branch-free atan2 built from the polynomial atan."""
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), eps)
    t = atan_poly(num / den)
    t = jnp.where(swap, _PI / 2 - t, t)
    t = jnp.where(x < 0, _PI - t, t)
    return jnp.where(y < 0, -t, t)


def yaw_of(q):
    x, y, z, w = q
    return atan2_tiles(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def euler_zyx(q):
    """(roll, pitch, yaw) mirroring math3d.quat_to_euler_zyx; asin/atan2 are
    expressed with the polynomial atan (no Mosaic lowering for either)."""
    x, y, z, w = q
    roll = atan2_tiles(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = atan2_tiles(sp, jnp.sqrt(jnp.maximum(1.0 - sp * sp, 1e-12)))
    yaw = atan2_tiles(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


# ---- small dense matrices as nested python lists of tiles ----

def mat_zeros(n, m):
    return [[0.0] * m for _ in range(n)]


def matvec(M, v):
    n = len(M)
    m = len(v)
    return [sum(M[i][j] * v[j] for j in range(m)) for i in range(n)]


def mat_add(A, B):
    return [[A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def cholesky_factor(M, eps=1e-9):
    """Lower-triangular Cholesky factor of SPD M (nested lists of tiles),
    unrolled. Factor once, back-substitute many (couple-contact solves reuse
    the factor for Ψ columns and per-sweep generalized responses)."""
    n = len(M)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = M[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(d, eps))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def cholesky_solve_factored(L, b):
    """Back-substitute with a factor from cholesky_factor."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def cholesky_solve(M, b, eps=1e-9):
    """Solve M x = b for SPD M (nested lists of tiles), unrolled —
    mirrors physics/linalg.solve_psd."""
    return cholesky_solve_factored(cholesky_factor(M, eps), b)
