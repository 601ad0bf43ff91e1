"""Compliant contact engine: static pair tables + vectorized narrowphase.

Replaces PhysX's TGS contact solver (reference `isaacgym_wrapper.py:30-36`)
with a MuJoCo-style mass-scaled penalty model that is branch-free and fully
vectorizable: every candidate contact is computed every step with its force
clamped to zero when separated. The pair list is STATIC (built at scene
construction), so under ``vmap`` the whole narrowphase is a handful of
(K, ncontact, ·) elementwise ops — no data-dependent shapes anywhere.

Primitive set: plane (world z=0), sphere, capsule, box. Spheres and capsules
share one "capsuloid" (segment + radius) code path.

Force law per contact point (normal n from B→A, depth d > 0 penetrating):
    kn = m_eff / (τ² · n_pts),  kd = 2 ζ m_eff / (τ · n_pts)
    f_n = max(0, kn·d − kd·v_n),  f_t = −μ f_n · v_t/(‖v_t‖ + ε_v)
with τ tied to the substep dt — stiffness auto-scales to the integrator, the
same trick MuJoCo's solref uses, so stacks are stable at reference dt values.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from .math3d import quat_mul, quat_rotate
from .scene_model import SceneModel
from .urdf import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE


@dataclass
class ContactTables:
    """Static (numpy) narrowphase work lists, grouped by dispatch kind."""
    # capsuloid vs plane: 2 endpoint contacts each
    cp_geom: np.ndarray
    cp_meff: np.ndarray
    cp_mu: np.ndarray
    # box vs plane: 8 corner contacts each
    bp_geom: np.ndarray
    bp_meff: np.ndarray
    bp_mu: np.ndarray
    # capsuloid vs capsuloid: 1 contact
    cc_a: np.ndarray
    cc_b: np.ndarray
    cc_meff: np.ndarray
    cc_mu: np.ndarray
    # capsuloid vs box: 3 contacts
    cb_cap: np.ndarray
    cb_box: np.ndarray
    cb_meff: np.ndarray
    cb_mu: np.ndarray
    # box vs box: 16 corner contacts
    bb_a: np.ndarray
    bb_b: np.ndarray
    bb_meff: np.ndarray
    bb_mu: np.ndarray


def _body_mass_for_contact(scene: SceneModel, gi: int) -> float:
    b = int(scene.geom_body[gi])
    ai = int(scene.body_actor[b])
    art = scene.actors[ai]
    local = b - scene.body_offset[ai]
    m = float(art.mass[local])
    if art.fixed_base and art.ndof == 0:
        return np.inf
    # links attached through joints still feel roughly their subtree mass;
    # link mass is a fine effective-mass proxy for stiffness scaling
    return max(m, 1e-3)


def _pair_meff(scene: SceneModel, gi: int, gj: int) -> float:
    ma, mb = _body_mass_for_contact(scene, gi), _body_mass_for_contact(scene, gj)
    if np.isinf(ma) and np.isinf(mb):
        return 1.0
    if np.isinf(ma):
        return mb
    if np.isinf(mb):
        return ma
    return ma * mb / (ma + mb)


def build_contact_tables(scene: SceneModel) -> ContactTables:
    cp_g, cp_m, cp_f = [], [], []
    bp_g, bp_m, bp_f = [], [], []
    cc_a, cc_b, cc_m, cc_f = [], [], [], []
    cb_c, cb_bx, cb_m, cb_f = [], [], [], []
    bb_a, bb_b, bb_m, bb_f = [], [], [], []

    gt = scene.geom_type
    for gi in scene.plane_geoms:
        gi = int(gi)
        m = _body_mass_for_contact(scene, gi)
        if np.isinf(m):
            continue
        mu = scene.geom_friction[gi]
        if gt[gi] == GEOM_BOX:
            bp_g.append(gi); bp_m.append(m); bp_f.append(mu)
        else:
            cp_g.append(gi); cp_m.append(m); cp_f.append(mu)

    for gi, gj in zip(scene.pair_a, scene.pair_b):
        gi, gj = int(gi), int(gj)
        meff = _pair_meff(scene, gi, gj)
        mu = 0.5 * (scene.geom_friction[gi] + scene.geom_friction[gj])
        ta, tb = gt[gi], gt[gj]
        a_box, b_box = ta == GEOM_BOX, tb == GEOM_BOX
        if a_box and b_box:
            bb_a.append(gi); bb_b.append(gj); bb_m.append(meff); bb_f.append(mu)
        elif a_box:
            cb_c.append(gj); cb_bx.append(gi); cb_m.append(meff); cb_f.append(mu)
        elif b_box:
            cb_c.append(gi); cb_bx.append(gj); cb_m.append(meff); cb_f.append(mu)
        else:
            cc_a.append(gi); cc_b.append(gj); cc_m.append(meff); cc_f.append(mu)

    def arr(x, dt=np.int32):
        return np.asarray(x, dtype=dt)

    return ContactTables(
        cp_geom=arr(cp_g), cp_meff=arr(cp_m, np.float64), cp_mu=arr(cp_f, np.float64),
        bp_geom=arr(bp_g), bp_meff=arr(bp_m, np.float64), bp_mu=arr(bp_f, np.float64),
        cc_a=arr(cc_a), cc_b=arr(cc_b), cc_meff=arr(cc_m, np.float64), cc_mu=arr(cc_f, np.float64),
        cb_cap=arr(cb_c), cb_box=arr(cb_bx), cb_meff=arr(cb_m, np.float64), cb_mu=arr(cb_f, np.float64),
        bb_a=arr(bb_a), bb_b=arr(bb_b), bb_meff=arr(bb_m, np.float64), bb_mu=arr(bb_f, np.float64),
    )


# ---------------------------------------------------------------------------
# geometry helpers (all batched over leading axes)
# ---------------------------------------------------------------------------

def _capsuloid_segment(gtype, size, pos, quat):
    """Segment endpoints + radius for sphere/capsule geoms. Capsule axis = local z."""
    r = size[..., 0]
    hl = jnp.where(gtype == GEOM_CAPSULE, size[..., 1], 0.0)
    axis = quat_rotate(quat, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pos.dtype), pos.shape))
    p0 = pos - axis * hl[..., None]
    p1 = pos + axis * hl[..., None]
    return p0, p1, r


def _segment_closest(p0, p1, q0, q1, eps=1e-9):
    """Closest points between segments [p0,p1] and [q0,q1]."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t = jnp.where(e > eps, jnp.clip((b * s + f) / jnp.maximum(e, eps), 0.0, 1.0), 0.0)
    # re-project s for clamped t
    s = jnp.where(a > eps, jnp.clip((b * t - c) / jnp.maximum(a, eps), 0.0, 1.0), 0.0)
    cp = p0 + d1 * s[..., None]
    cq = q0 + d2 * t[..., None]
    return cp, cq


def _point_to_box(point, box_pos, box_quat, half):
    """Closest feature between a point and an oriented box.

    Returns (normal (→ away from box, world), depth (>0 if sphere-center
    penetration measured to the surface), closest surface point world).
    Handles both inside and outside cases branch-free.
    """
    # to box local frame
    lp = quat_rotate(jnp.concatenate([-box_quat[..., :3], box_quat[..., 3:]], -1), point - box_pos)
    clamped = jnp.clip(lp, -half, half)
    outside_vec = lp - clamped
    outside_dist = jnp.linalg.norm(outside_vec, axis=-1)
    is_outside = outside_dist > 1e-9
    # inside: distance to nearest face
    face_dist = half - jnp.abs(lp)                      # (...,3) ≥0 when inside
    min_axis = jnp.argmin(face_dist, axis=-1)
    eye = jnp.eye(3, dtype=point.dtype)
    n_inside_local = eye[min_axis] * jnp.sign(
        jnp.take_along_axis(lp, min_axis[..., None], axis=-1)
    )
    d_inside = jnp.take_along_axis(face_dist, min_axis[..., None], axis=-1)[..., 0]
    n_outside_local = outside_vec / jnp.maximum(outside_dist, 1e-9)[..., None]
    n_local = jnp.where(is_outside[..., None], n_outside_local, n_inside_local)
    depth_center = jnp.where(is_outside, -outside_dist, d_inside)
    surf_local = jnp.where(is_outside[..., None], clamped, lp + n_inside_local * d_inside[..., None])
    n_world = quat_rotate(box_quat, n_local)
    surf_world = box_pos + quat_rotate(box_quat, surf_local)
    return n_world, depth_center, surf_world


_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float64,
)  # (8,3)


def _box_corners(pos, quat, half):
    """(...,8,3) world corners."""
    corners = jnp.asarray(_BOX_CORNERS, pos.dtype) * half[..., None, :]
    return pos[..., None, :] + quat_rotate(quat[..., None, :], corners)


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------

def compute_contact_forces(
    scene: SceneModel,
    tables: ContactTables,
    body_pos,
    body_quat,
    body_linvel,
    body_angvel,
    geom_friction_scale,
    dt_sub: float,
):
    """All contact forces for one env.

    Returns (f_ext (nbody,6) Plücker world forces, net_cf (nbody,3)).
    geom_friction_scale: (ngeom,) per-env domain-randomization multiplier.
    """
    dt_ = body_pos.dtype
    nb = scene.nbody
    tau_c = jnp.asarray(max(2.0 * dt_sub, 1e-3), dt_)
    zeta = 1.0

    # world poses of all geoms
    g_body = jnp.asarray(scene.geom_body)
    gp = body_pos[g_body] + quat_rotate(body_quat[g_body], jnp.asarray(scene.geom_pos, dt_))
    gq = quat_mul(body_quat[g_body], jnp.asarray(scene.geom_quat, dt_))

    contacts = []  # each: dict(point, normal, depth, body_a, body_b, kn, kd, mu)

    def add_contacts(point, normal, depth, geom_a, geom_b, meff, mu, npts):
        """geom_b < 0 → world plane."""
        kn = jnp.asarray(meff, dt_) / (tau_c * tau_c * npts)
        kd = 2.0 * zeta * jnp.asarray(meff, dt_) / (tau_c * npts)
        ba = g_body[jnp.asarray(geom_a)]
        bb = jnp.where(
            jnp.asarray(geom_b) >= 0,
            g_body[jnp.clip(jnp.asarray(geom_b), 0, None)],
            -1,
        )
        contacts.append((point, normal, depth, ba, bb, kn, kd, jnp.asarray(mu, dt_)))

    # ---- capsuloid vs plane: 2 endpoint contacts ----
    if len(tables.cp_geom):
        g = jnp.asarray(tables.cp_geom)
        gt = jnp.asarray(scene.geom_type)[g]
        size = jnp.asarray(scene.geom_size, dt_)[g]
        p0, p1, r = _capsuloid_segment(gt, size, gp[g], gq[g])
        musc = jnp.asarray(tables.cp_mu, dt_) * geom_friction_scale[g]
        for pend in (p0, p1):
            depth = r - pend[..., 2]
            normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dt_), pend.shape)
            point = pend.at[..., 2].add(-r)
            add_contacts(point, normal, depth, g, -jnp.ones_like(g), tables.cp_meff, musc, 2.0)

    # ---- box vs plane: 8 corners ----
    if len(tables.bp_geom):
        g = jnp.asarray(tables.bp_geom)
        half = jnp.asarray(scene.geom_size, dt_)[g]
        corners = _box_corners(gp[g], gq[g], half)          # (n,8,3)
        musc = jnp.asarray(tables.bp_mu, dt_) * geom_friction_scale[g]
        n = corners.shape[0]
        for ci in range(8):
            pt = corners[:, ci]
            depth = -pt[..., 2]
            normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dt_), pt.shape)
            add_contacts(pt, normal, depth, g, -jnp.ones_like(g), tables.bp_meff, musc, 4.0)

    # ---- capsuloid vs capsuloid ----
    if len(tables.cc_a):
        ga, gb = jnp.asarray(tables.cc_a), jnp.asarray(tables.cc_b)
        gt_all = jnp.asarray(scene.geom_type)
        size = jnp.asarray(scene.geom_size, dt_)
        pa0, pa1, ra = _capsuloid_segment(gt_all[ga], size[ga], gp[ga], gq[ga])
        pb0, pb1, rb = _capsuloid_segment(gt_all[gb], size[gb], gp[gb], gq[gb])
        ca, cb = _segment_closest(pa0, pa1, pb0, pb1)
        delta = ca - cb
        dist = jnp.linalg.norm(delta, axis=-1)
        normal = delta / jnp.maximum(dist, 1e-9)[..., None]   # B → A
        depth = (ra + rb) - dist
        point = cb + normal * (rb - 0.5 * jnp.maximum(depth, 0.0))[..., None]
        musc = jnp.asarray(tables.cc_mu, dt_) * 0.5 * (
            geom_friction_scale[ga] + geom_friction_scale[gb]
        )
        add_contacts(point, normal, depth, ga, gb, tables.cc_meff, musc, 1.0)

    # ---- capsuloid vs box: 3 sample spheres ----
    if len(tables.cb_cap):
        gc, gx = jnp.asarray(tables.cb_cap), jnp.asarray(tables.cb_box)
        gt_all = jnp.asarray(scene.geom_type)
        size = jnp.asarray(scene.geom_size, dt_)
        p0, p1, r = _capsuloid_segment(gt_all[gc], size[gc], gp[gc], gq[gc])
        half = size[gx]
        musc = jnp.asarray(tables.cb_mu, dt_) * 0.5 * (
            geom_friction_scale[gc] + geom_friction_scale[gx]
        )
        # endpoints + closest point of segment to box center
        bc = gp[gx]
        cp_seg, _ = _segment_closest(p0, p1, bc, bc)
        for sp in (p0, p1, cp_seg):
            n_w, depth_c, surf = _point_to_box(sp, gp[gx], gq[gx], half)
            depth = depth_c + r
            add_contacts(surf, n_w, depth, gc, gx, tables.cb_meff, musc, 2.0)

    # ---- box vs box: corners of each in the other ----
    if len(tables.bb_a):
        ga, gb = jnp.asarray(tables.bb_a), jnp.asarray(tables.bb_b)
        size = jnp.asarray(scene.geom_size, dt_)
        musc = jnp.asarray(tables.bb_mu, dt_) * 0.5 * (
            geom_friction_scale[ga] + geom_friction_scale[gb]
        )
        ca = _box_corners(gp[ga], gq[ga], size[ga])   # (n,8,3)
        cb = _box_corners(gp[gb], gq[gb], size[gb])
        for ci in range(8):
            # corner of A against box B: normal from B→A
            n_w, depth_c, surf = _point_to_box(ca[:, ci], gp[gb], gq[gb], size[gb])
            add_contacts(surf, n_w, depth_c, ga, gb, tables.bb_meff, musc, 4.0)
        for ci in range(8):
            n_w, depth_c, surf = _point_to_box(cb[:, ci], gp[ga], gq[ga], size[ga])
            # normal away from A; flip so it points B→A
            add_contacts(surf, -n_w, depth_c, ga, gb, tables.bb_meff, musc, 4.0)

    f_ext = jnp.zeros((nb, 6), dt_)
    net_cf = jnp.zeros((nb, 3), dt_)
    if not contacts:
        return f_ext, net_cf

    point = jnp.concatenate([c[0] for c in contacts])
    normal = jnp.concatenate([c[1] for c in contacts])
    depth = jnp.concatenate([c[2] for c in contacts])
    body_a = jnp.concatenate([jnp.broadcast_to(c[3], c[2].shape) for c in contacts])
    body_b = jnp.concatenate([jnp.broadcast_to(c[4], c[2].shape) for c in contacts])
    kn = jnp.concatenate([jnp.broadcast_to(c[5], c[2].shape) for c in contacts])
    kd = jnp.concatenate([jnp.broadcast_to(c[6], c[2].shape) for c in contacts])
    mu = jnp.concatenate([jnp.broadcast_to(c[7], c[2].shape) for c in contacts])

    # velocity of contact point on each body
    def point_vel(b, p):
        bi = jnp.clip(b, 0, nb - 1)
        v = body_linvel[bi] + jnp.cross(body_angvel[bi], p - body_pos[bi])
        return jnp.where((b >= 0)[..., None], v, 0.0)

    v_rel = point_vel(body_a, point) - point_vel(body_b, point)
    vn = jnp.sum(v_rel * normal, -1)
    vt = v_rel - vn[..., None] * normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)

    active = depth > 0.0
    fn = jnp.where(active, jnp.maximum(kn * depth - kd * vn, 0.0), 0.0)
    eps_v = jnp.asarray(scene.friction_smoothing_vel, dt_)
    ft = -(mu * fn / jnp.maximum(vt_norm, eps_v))[..., None] * vt
    force = fn[..., None] * normal + ft                   # on body A

    # Plücker world force about origin: [p×F; F]
    plk_a = jnp.concatenate([jnp.cross(point, force), force], axis=-1)
    a_idx = jnp.clip(body_a, 0, nb - 1)
    b_idx = jnp.clip(body_b, 0, nb - 1)
    valid_b = (body_b >= 0)[..., None]
    f_ext = f_ext.at[a_idx].add(plk_a)
    f_ext = f_ext.at[b_idx].add(jnp.where(valid_b, -plk_a, 0.0))
    net_cf = net_cf.at[a_idx].add(force)
    net_cf = net_cf.at[b_idx].add(jnp.where(valid_b, -force, 0.0))
    return f_ext, net_cf
