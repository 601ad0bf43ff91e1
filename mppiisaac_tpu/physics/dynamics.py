"""Articulated rigid-body dynamics — world-frame (Plücker) CRBA + RNEA.

Replaces the reference's closed-source PhysX articulation solver (SURVEY §2.2).
TPU-first design choices:

* All spatial quantities live in world-frame Plücker coordinates about the
  world origin — no per-joint coordinate transforms, so the whole algorithm is
  a static chain of small batched tensor ops that XLA fuses aggressively.
* The mass matrix is assembled with ONE (nv,6)x(6,nv) contraction + a static
  ancestry mask instead of Featherstone's per-ancestor inner loop — under vmap
  over K samples this becomes a (K,nv,6)·(K,6,nv) batched matmul (MXU-friendly).
* Joint drives (PD velocity/position/effort — parity with reference defaults,
  `isaacgym_wrapper.py:491-507`) are folded implicitly into the mass matrix
  diagonal, giving unconditional stability at dt=0.05 with damping kd=600.

Spatial vector convention: motion = [ω; v_O], force = [n_O; f], both about the
world origin. v_O = linvel − ω×pos for a body whose origin moves at `linvel`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .math3d import quat_to_matrix
from .model import (
    DRIVE_EFFORT,
    DRIVE_NONE,
    DRIVE_POSITION,
    DRIVE_VELOCITY,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
    Articulation,
)


class ActorMasks(NamedTuple):
    """Static (numpy) topology masks for one articulation."""
    nv: int                      # generalized velocity dim (6·floating + ndof)
    base_dofs: int               # 6 if floating else 0
    dof_body: np.ndarray         # (nv,) body index owning each velocity coordinate
    ancestor: np.ndarray         # (nv,nv) bool: [i,j] = i is ancestor-or-self dof of j
    subtree: np.ndarray          # (nv,nbody) bool: body b in subtree rooted at dof i's body


def build_actor_masks(art: Articulation) -> ActorMasks:
    base = 0 if art.fixed_base else 6
    nv = base + art.ndof
    dof_body = np.zeros(nv, dtype=np.int32)
    body_dofs = [[] for _ in range(art.nbody)]  # dofs "at" each body (inboard joint)
    if base:
        dof_body[:6] = 0
        body_dofs[0] = list(range(6))
    for i in range(art.nbody):
        k = int(art.dof_index[i])
        if k >= 0:
            dof_body[base + k] = i
            body_dofs[i].append(base + k)

    # body ancestry (incl. self)
    anc_body = np.zeros((art.nbody, art.nbody), dtype=bool)
    for b in range(art.nbody):
        x = b
        while x >= 0:
            anc_body[x, b] = True
            x = int(art.parent[x])

    ancestor = np.zeros((nv, nv), dtype=bool)
    for i in range(nv):
        for j in range(nv):
            bi, bj = dof_body[i], dof_body[j]
            if anc_body[bi, bj]:
                if bi != bj:
                    ancestor[i, j] = True
                else:
                    # same body: floating-base block, or identical dof
                    ancestor[i, j] = i <= j
    subtree = np.zeros((nv, art.nbody), dtype=bool)
    for i in range(nv):
        subtree[i] = anc_body[dof_body[i]]
    return ActorMasks(nv=nv, base_dofs=base, dof_body=dof_body, ancestor=ancestor, subtree=subtree)


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def spatial_inertia_world(mass, com_world, R, I_com_body):
    """6x6 spatial inertia about the world origin."""
    Iw = R @ I_com_body @ jnp.swapaxes(R, -1, -2)
    C = _skew(com_world)
    mC = mass[..., None, None] * C
    top = jnp.concatenate([Iw + mC @ jnp.swapaxes(C, -1, -2), mC], axis=-1)
    bot = jnp.concatenate(
        [jnp.swapaxes(mC, -1, -2), mass[..., None, None] * jnp.eye(3)], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def crm(v, m):
    """Motion-cross-motion: v × m."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1
    )


def crf(v, f):
    """Motion-cross-force: v ×* f."""
    w, vo = v[..., :3], v[..., 3:]
    n, fv = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vo, fv), jnp.cross(w, fv)], axis=-1
    )


class DynInputs(NamedTuple):
    pos: jnp.ndarray       # (nb,3) body origins, world
    quat: jnp.ndarray      # (nb,4)
    linvel: jnp.ndarray    # (nb,3)
    angvel: jnp.ndarray    # (nb,3)
    anchors: jnp.ndarray   # (nb,3) inboard joint anchor, world
    axes: jnp.ndarray      # (nb,3) inboard joint axis, world


def motion_subspaces(art: Articulation, masks: ActorMasks, din: DynInputs):
    """(nv,6) Plücker motion subspaces, world frame."""
    rows = []
    if masks.base_dofs:
        # floating base: ω basis then v basis (identity)
        rows.extend(list(jnp.eye(6, dtype=din.pos.dtype)))
    for i in range(art.nbody):
        k = int(art.dof_index[i])
        if k < 0:
            continue
        a = din.axes[i]
        if int(art.jtype[i]) == JOINT_REVOLUTE:
            rows.append(jnp.concatenate([a, jnp.cross(din.anchors[i], a)]))
        else:  # prismatic
            rows.append(jnp.concatenate([jnp.zeros(3, din.pos.dtype), a]))
    # document-order dofs == model dof order because build_articulation assigns
    # dof ids in joint document order; rows were appended in body (topological)
    # order, so reorder to dof order.
    base = masks.base_dofs
    joint_rows = rows[base:]
    body_order_dofs = [int(art.dof_index[i]) for i in range(art.nbody) if int(art.dof_index[i]) >= 0]
    reorder = np.argsort(np.asarray(body_order_dofs))
    joint_rows = [joint_rows[r] for r in reorder]
    return jnp.stack(rows[:base] + joint_rows)


def body_spatial_velocity(din: DynInputs):
    """(nb,6) Plücker velocities from FK outputs."""
    w = din.angvel
    vo = din.linvel - jnp.cross(w, din.pos)
    return jnp.concatenate([w, vo], axis=-1)


def mass_matrix(art, masks: ActorMasks, S, Iw):
    """CRBA via ancestry-masked contraction. Iw: (nb,6,6)."""
    # composite inertias (reverse topological accumulation, unrolled)
    Ic = [Iw[i] for i in range(art.nbody)]
    for i in range(art.nbody - 1, 0, -1):
        p = int(art.parent[i])
        Ic[p] = Ic[p] + Ic[i]
    Ic = jnp.stack(Ic)                                   # (nb,6,6)
    IcS = jnp.einsum("vab,vb->va", Ic[masks.dof_body], S)  # F_j = Ic[body(j)] S_j
    Mfull = jnp.einsum("ia,ja->ij", S, IcS)              # M[i,j] = S_i · F_j
    mask = jnp.asarray(masks.ancestor)
    Mm = jnp.where(mask, Mfull, 0.0)
    return Mm + jnp.swapaxes(Mm, -1, -2) - jnp.diag(jnp.diag(Mm))


def bias_and_external(art, masks: ActorMasks, S, Iw, v_b, qd_joint, f_ext, gravity):
    """RNEA (qdd = 0) bias forces C(q,qd)·qd + g − Qext, as generalized forces.

    v_b: (nb,6) body Plücker velocities; qd_joint: (ndof,); f_ext: (nb,6)
    Plücker external forces (world, about origin). Returns (nv,) generalized
    force `C` such that M u̇ = τ − C.
    """
    dt_ = v_b.dtype
    g_sp = jnp.concatenate([jnp.zeros(3, dt_), -jnp.asarray(gravity, dt_)])
    if art.disable_gravity:
        g_sp = jnp.zeros(6, dt_)
    base = masks.base_dofs
    # forward pass: accelerations with a_root = -g (free-fall trick), qdd = 0
    a = [g_sp]
    for i in range(1, art.nbody):
        p = int(art.parent[i])
        k = int(art.dof_index[i])
        ai = a[p]
        if k >= 0:
            s_row = S[base + k]
            vj = s_row * qd_joint[k]
            ai = ai + crm(v_b[i], vj)
        a.append(ai)
    a = jnp.stack(a)
    # net body forces
    f = (
        jnp.einsum("bij,bj->bi", Iw, a)
        + crf(v_b, jnp.einsum("bij,bj->bi", Iw, v_b))
        - f_ext
    )
    # backward: C[i] = S_i · Σ_{b ∈ subtree(body(i))} f_b
    subtree = jnp.asarray(masks.subtree, dtype=f.dtype)   # (nv,nb)
    fsub = jnp.einsum("vb,bi->vi", subtree, f)
    return jnp.einsum("vi,vi->v", S, fsub)


def drive_terms(art: Articulation, q, qd, dof_target, dt):
    """Implicit PD drive decomposition.

    Returns (tau_explicit (ndof,), d_implicit (ndof,)) such that the drive
    torque is  τ = tau_explicit − d_implicit · qd_next  (qd_next the post-step
    velocity), to be folded into the linear solve. Effort-limit saturation
    falls back to an explicit clamped torque (parity with PhysX maxForce).
    """
    if art.ndof == 0:
        z = jnp.zeros(0, q.dtype)
        return z, z
    mode = jnp.asarray(art.drive_mode)
    kp = jnp.asarray(art.drive_kp, q.dtype)
    kd = jnp.asarray(art.drive_kd, q.dtype)
    effort = jnp.asarray(art.dof_effort, q.dtype)

    # force-limited implicit velocity drive: kd_eff = min(kd, F/|Δv|)
    kd_eff = jnp.minimum(kd, effort / jnp.maximum(jnp.abs(dof_target - qd), 1e-6))
    vel_tau = kd_eff * dof_target
    vel_d = kd_eff

    # position drive, same treatment
    kp_eff = jnp.minimum(kp, effort / jnp.maximum(jnp.abs(dof_target - q), 1e-6))
    pos_tau = kp_eff * (dof_target - q)
    pos_d = kp_eff * dt + kd

    # effort drive: τ = u − kd qd_next (passive damping 10, implicit)
    eff_tau = jnp.clip(dof_target, -effort, effort)
    eff_d = kd

    tau = jnp.where(
        mode == DRIVE_VELOCITY,
        vel_tau,
        jnp.where(mode == DRIVE_POSITION, pos_tau, jnp.where(mode == DRIVE_EFFORT, eff_tau, 0.0)),
    )
    d_imp = jnp.where(
        mode == DRIVE_VELOCITY,
        vel_d,
        jnp.where(mode == DRIVE_POSITION, pos_d, jnp.where(mode == DRIVE_EFFORT, eff_d, 0.0)),
    )
    # passive URDF joint damping, implicit
    d_imp = d_imp + jnp.asarray(art.dof_damping, q.dtype)
    # smooth Coulomb joint friction (explicit)
    tau = tau - jnp.asarray(art.dof_friction, q.dtype) * jnp.tanh(qd / 0.02)
    return tau, d_imp


JOINT_LIMIT_KP = 1.0e3
JOINT_LIMIT_KD = 1.0e2


def joint_limit_torque(art: Articulation, q, qd):
    if art.ndof == 0:
        return jnp.zeros(0, q.dtype)
    lo = jnp.asarray(art.dof_lower, q.dtype)
    hi = jnp.asarray(art.dof_upper, q.dtype)
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    viol = (below > 0) | (above > 0)
    return JOINT_LIMIT_KP * (below - above) - jnp.where(viol, JOINT_LIMIT_KD * qd, 0.0)


def solve_velocity_update(
    art: Articulation,
    masks: ActorMasks,
    din: DynInputs,
    q,
    qd,
    dof_target,
    f_ext,
    gravity,
    dt,
    mass_scale=None,
):
    """One implicit velocity update for one articulation.

    Returns u_new (nv,): new generalized velocities ([ω, v_O] base part first
    if floating). f_ext: (nb,6) Plücker world contact/external forces.
    """
    base = masks.base_dofs
    dt_ = q.dtype
    mass = jnp.asarray(art.mass, dt_)
    I_com = jnp.asarray(art.inertia, dt_)
    if mass_scale is not None:
        mass = mass * mass_scale
        I_com = I_com * mass_scale[..., None, None]
    R = quat_to_matrix(din.quat)
    com_world = din.pos + jnp.einsum("bij,bj->bi", R, jnp.asarray(art.com, dt_))
    Iw = spatial_inertia_world(mass, com_world, R, I_com)
    S = motion_subspaces(art, masks, din)
    v_b = body_spatial_velocity(din)

    M = mass_matrix(art, masks, S, Iw)
    C = bias_and_external(art, masks, S, Iw, v_b, qd, f_ext, gravity)

    tau_d, d_imp = drive_terms(art, q, qd, dof_target, dt)
    tau_lim = joint_limit_torque(art, q, qd)
    tau = jnp.zeros(masks.nv, dt_)
    u = jnp.concatenate([v_b[0], qd]) if base else qd
    if art.ndof:
        tau = tau.at[base:].set(tau_d + tau_lim)
    rhs = M @ u + dt * (tau - C)
    # implicit drive/armature terms go only into the solve matrix
    if art.ndof:
        M = M.at[jnp.arange(base, masks.nv), jnp.arange(base, masks.nv)].add(
            dt * d_imp + jnp.asarray(art.dof_armature, dt_)
        )
    # small Tikhonov for safety on near-singular configurations
    M = M + jnp.eye(masks.nv, dtype=dt_) * 1e-9
    u_new = jnp.linalg.solve(M, rhs)

    if art.ndof:
        maxvel = jnp.asarray(art.dof_maxvel, dt_)
        u_new = u_new.at[base:].set(jnp.clip(u_new[base:], -maxvel, maxvel))
    return u_new
