"""Compliant contact engine: static candidate tables + vectorized narrowphase.

Replaces PhysX's TGS contact solver (reference `isaacgym_wrapper.py:30-36`)
with a MuJoCo-style mass-scaled penalty model that is branch-free and fully
vectorizable: every candidate contact is computed every step with its force
clamped to zero when separated.

TPU-first structure: the ENTIRE candidate list (every pair × every manifold
point) is enumerated at scene-build time into flat numpy tables — body
indices, effective masses, friction, stiffness divisors. At runtime only
(point, normal, depth) are computed, in fixed table order, and forces are
accumulated onto bodies with a static one-hot matrix multiply. No runtime
index computation anywhere: dynamic gathers/scatters are a TPU slow path.

Force law per contact point (normal n from B→A, depth d > 0 penetrating):
    kn = m_eff / (τ² · n_pts),  kd = 2 ζ m_eff / (τ · n_pts)
    f_n = max(0, kn·d − kd·v_n),  f_t = −μ f_n · v_t/(‖v_t‖ + ε_v)
with τ tied to the substep dt (MuJoCo solref-style), so stacks are stable at
reference dt values.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp
import numpy as np

from .math3d import quat_mul, quat_rotate
from .scene_model import SceneModel
from .urdf import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE


@dataclass
class ContactTables:
    """Static narrowphase work lists (numpy). Group fields drive the runtime
    narrowphase; the flat per-candidate fields drive force assembly."""
    # groups (geom indices)
    cp_geom: np.ndarray          # capsuloid vs plane (2 endpoint contacts each)
    bp_geom: np.ndarray          # box vs plane (8 corners each)
    cc_a: np.ndarray             # capsuloid vs capsuloid (1 contact)
    cc_b: np.ndarray
    cb_cap: np.ndarray           # capsuloid vs box (3 contacts)
    cb_box: np.ndarray
    bb_a: np.ndarray             # box vs box, FULL 2×26-sample manifold (rare)
    bb_b: np.ndarray
    # box vs box, reduced DIRECTIONAL manifold: corners of bbc_a sampled
    # against box bbc_b (8 candidates). Directions where the sampled box is
    # far larger than the host (table corners vs a block) are dropped at
    # table-build time — they cannot produce meaningful contact and were the
    # bulk of the fused kernel's sweep workload (a full pair costs 52
    # candidates; a typical reduced pair costs 8-16)
    bbc_a: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    bbc_b: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    # per-table bbc sample count: the WORLD tables use the full 14-sample
    # reduced manifold (corners + face centers); a planner-model table may be
    # built with 8 (corners only) — the fast-fidelity fused rollout trades the
    # face-face support patch for ~40% fewer swept candidates
    bbc_samples: int = 14
    # flat candidate tables, in the exact order the runtime concatenates
    n_con: int = 0
    con_geom_a: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    con_geom_b: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))  # -1 = plane
    kn_base: np.ndarray = field(default_factory=lambda: np.zeros(0))   # m_eff / n_pts
    n_pts: np.ndarray = field(default_factory=lambda: np.zeros(0))     # manifold divisor per candidate
    mu_base: np.ndarray = field(default_factory=lambda: np.zeros(0))
    kn_base_soft: np.ndarray = field(default_factory=lambda: np.zeros(0))  # mass-scaled (stable on free bodies)
    a_free: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    b_free: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    # two-way impulse coupling (grasping): side is on a dynamic ARTICULATED
    # actor and the other side is free → the articulated side joins the
    # impulse pass through its joint-space effective mass J M⁻¹ Jᵀ
    a_art: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    b_art: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    # articulated STICTION contacts (locomotion): side is on a FLOATING-base
    # articulated actor and the other side is static (plane / fixed actor).
    # The smoothed Coulomb penalty alone lets feet creep (viscous below
    # friction_smoothing_vel — a standing quadruped skates ~1 cm/s); these
    # candidates join the impulse pass FRICTION-ONLY (normal stays penalty)
    a_sta: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    b_sta: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    art_bodies: tuple = ()       # body indices needing an operational-space Ψ
    acc_a: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), np.float32))  # (B, n_con) +1 one-hot
    acc_b: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), np.float32))  # (B, n_con) +1 one-hot (0 for plane)


def _body_mass_for_contact(scene: SceneModel, gi: int) -> float:
    b = int(scene.geom_body[gi])
    ai = int(scene.body_actor[b])
    art = scene.actors[ai]
    if art.fixed_base and art.ndof == 0:
        return np.inf
    if art.ndof > 0:
        # articulated: a contact link carries a share of the whole robot.
        # Geometric mean of link and total mass: pure link mass sags under the
        # chassis, pure total mass over-stiffens the light wheel's local modes
        local_m = float(art.mass[b - scene.body_offset[ai]])
        total_m = float(np.sum(art.mass))
        return max(np.sqrt(max(local_m, 1e-3) * max(total_m, 1e-3)), 1e-3)
    local = b - scene.body_offset[ai]
    return max(float(art.mass[local]), 1e-3)


def _pair_meff(scene: SceneModel, gi: int, gj: int) -> float:
    ma, mb = _body_mass_for_contact(scene, gi), _body_mass_for_contact(scene, gj)
    if np.isinf(ma) and np.isinf(mb):
        return 1.0
    if np.isinf(ma):
        return mb
    if np.isinf(mb):
        return ma
    return ma * mb / (ma + mb)


# A box samples its points against a partner box only when its volume is
# within this factor of the partner's — beyond it (a table vs a block) the
# bigger box's sample points cannot produce contact and the direction is
# dropped
BB_DROP_VOL_RATIO = 64.0

# Reduced per-direction sample set: corners + face centers
# (_BOX_SAMPLES[:14]). Corners alone miss face-face contacts whenever
# neither box's corners enter the other's interior (a wide pusher against a
# narrower block: the pusher's corners pass outside, the block's corners
# slide along the pusher's boundary planes at zero depth) — the face-center
# samples carry exactly that configuration. Edge midpoints (the remaining
# 12 of the full 26) only matter for edge-edge crossings and are dropped.
N_BBC_SAMPLES = 14


def build_contact_tables(scene: SceneModel,
                         bbc_samples: int = N_BBC_SAMPLES) -> ContactTables:
    gt = scene.geom_type
    cp_g, bp_g = [], []
    cc_a, cc_b = [], []
    cb_c, cb_bx = [], []
    bb_a, bb_b = [], []

    for gi in scene.plane_geoms:
        gi = int(gi)
        if np.isinf(_body_mass_for_contact(scene, gi)):
            continue
        (bp_g if gt[gi] == GEOM_BOX else cp_g).append(gi)

    bbc_a_l: List[int] = []
    bbc_b_l: List[int] = []

    def _box_vol(g):
        s = scene.geom_size[g]
        return max(float(s[0] * s[1] * s[2]), 1e-12)

    for gi, gj in zip(scene.pair_a, scene.pair_b):
        gi, gj = int(gi), int(gj)
        a_box, b_box = gt[gi] == GEOM_BOX, gt[gj] == GEOM_BOX
        if a_box and b_box:
            # reduced directional manifold: corners of X against box Y, with
            # the direction dropped when X is far bigger than Y (X's corners
            # cannot reach into Y in any pose the solver should care about).
            # Corner-only sampling keeps ≥4-point support patches for
            # face-face contact (stacking, finger-pad squeezes) at 8
            # candidates/direction vs the full manifold's 26
            va, vb = _box_vol(gi), _box_vol(gj)
            if va <= BB_DROP_VOL_RATIO * vb:
                bbc_a_l.append(gi); bbc_b_l.append(gj)
            if vb <= BB_DROP_VOL_RATIO * va:
                bbc_a_l.append(gj); bbc_b_l.append(gi)
        elif a_box:
            cb_c.append(gj); cb_bx.append(gi)
        elif b_box:
            cb_c.append(gi); cb_bx.append(gj)
        else:
            cc_a.append(gi); cc_b.append(gj)

    # flat candidate enumeration — ORDER MUST MATCH the runtime concatenation:
    # cp (2 endpoints, endpoint-major), bp (8 corners, corner-major),
    # cc (1), cb (3 sample points, point-major), bb (2×26 box samples,
    # sample-major, A-in-B then B-in-A), bbc (8 corners of a in b,
    # corner-major)
    ga_l: List[int] = []
    gb_l: List[int] = []
    npts_l: List[float] = []

    def emit(ga, gb, npts):
        ga_l.append(ga); gb_l.append(gb); npts_l.append(npts)

    for _ in range(2):
        for g in cp_g:
            emit(g, -1, 2.0)
    for _ in range(8):
        for g in bp_g:
            emit(g, -1, 4.0)
    for a, b in zip(cc_a, cc_b):
        emit(a, b, 1.0)
    for _ in range(3):
        for a, b in zip(cb_c, cb_bx):
            emit(a, b, 2.0)
    for _ in range(2 * N_BOX_SAMPLES):
        for a, b in zip(bb_a, bb_b):
            emit(a, b, 4.0)
    for _ in range(int(bbc_samples)):
        for a, b in zip(bbc_a_l, bbc_b_l):
            emit(a, b, 4.0)

    n = len(ga_l)
    ga_arr = np.asarray(ga_l, np.int32)
    gb_arr = np.asarray(gb_l, np.int32)
    npts = np.asarray(npts_l)
    meff = np.asarray([
        _pair_meff(scene, a, b) if b >= 0 else _body_mass_for_contact(scene, a)
        for a, b in zip(ga_l, gb_l)
    ])
    # articulated↔free couple pairs: fixed stiffness on the ARTICULATED side
    # (so actuators stall on light objects instead of passing through); the
    # free side keeps the mass-scaled (stable) stiffness — its fidelity comes
    # from the impulse pass
    free = _free_body_mask(scene)
    art = _articulated_body_mask(scene)
    meff_soft = meff.copy()
    tau_ref = max(2.0 * (scene.dt / max(scene.substeps, 1)), 1e-3)
    a_free_l = np.zeros(n, np.float32)
    b_free_l = np.zeros(n, np.float32)
    a_art_l = np.zeros(n, np.float32)
    b_art_l = np.zeros(n, np.float32)
    a_sta_l = np.zeros(n, np.float32)
    b_sta_l = np.zeros(n, np.float32)
    art_bodies: set = set()
    # floating-base articulated bodies (legged/mobile robots) get stiction
    # impulses against STATIC geometry — a fixed-base arm doesn't need them
    floating = np.zeros(scene.nbody, np.float32)
    for ai, a_ in enumerate(scene.actors):
        if not a_.fixed_base and (a_.ndof > 0 or a_.nbody > 1):
            o = scene.body_offset[ai]
            floating[o : o + a_.nbody] = 1.0
    static = 1.0 - np.maximum(free, art)      # fixed actors (planes are b<0)
    for c, (a, b) in enumerate(zip(ga_l, gb_l)):
        ba_ = scene.geom_body[a]
        a_free_l[c] = free[ba_]
        if b >= 0:
            b_free_l[c] = free[scene.geom_body[b]]
        fa_ = free[ba_] > 0
        fb_ = b >= 0 and free[scene.geom_body[b]] > 0
        if fa_ != fb_:
            # kn = kn_base/τ² at runtime → bake τ² back in for a fixed value
            meff[c] = scene.couple_stiffness * tau_ref * tau_ref
        # articulated↔free: the articulated side is solved TWO-WAY in the
        # impulse pass (J M⁻¹ Jᵀ effective mass) — the grasping fix
        if fb_ and art[ba_] > 0:
            a_art_l[c] = 1.0
            art_bodies.add(int(ba_))
        if fa_ and b >= 0 and art[scene.geom_body[b]] > 0:
            b_art_l[c] = 1.0
            art_bodies.add(int(scene.geom_body[b]))
        # articulated↔static: friction-only stiction impulses (foot-skating
        # fix) for floating-base robots against planes / fixed actors
        other_static = (b < 0) or static[scene.geom_body[b]] > 0
        if floating[ba_] > 0 and art[ba_] > 0 and other_static:
            a_sta_l[c] = 1.0
            art_bodies.add(int(ba_))
        if b >= 0 and floating[scene.geom_body[b]] > 0 and art[scene.geom_body[b]] > 0 \
                and static[ba_] > 0:
            b_sta_l[c] = 1.0
            art_bodies.add(int(scene.geom_body[b]))
    mu = np.asarray([
        0.5 * (scene.geom_friction[a] + scene.geom_friction[b]) if b >= 0
        else scene.geom_friction[a]
        for a, b in zip(ga_l, gb_l)
    ])

    B = scene.nbody
    acc_a = np.zeros((B, n), np.float32)
    acc_b = np.zeros((B, n), np.float32)
    for c, (a, b) in enumerate(zip(ga_l, gb_l)):
        acc_a[scene.geom_body[a], c] = 1.0
        if b >= 0:
            acc_b[scene.geom_body[b], c] = 1.0

    def arr(x):
        return np.asarray(x, np.int32)

    return ContactTables(
        cp_geom=arr(cp_g), bp_geom=arr(bp_g),
        cc_a=arr(cc_a), cc_b=arr(cc_b),
        cb_cap=arr(cb_c), cb_box=arr(cb_bx),
        bb_a=arr(bb_a), bb_b=arr(bb_b),
        bbc_a=arr(bbc_a_l), bbc_b=arr(bbc_b_l),
        n_con=n,
        con_geom_a=ga_arr, con_geom_b=gb_arr,
        kn_base=meff / npts, n_pts=npts, kn_base_soft=meff_soft / npts, mu_base=mu,
        a_free=a_free_l, b_free=b_free_l,
        a_art=a_art_l, b_art=b_art_l,
        a_sta=a_sta_l, b_sta=b_sta_l,
        art_bodies=tuple(sorted(art_bodies)),
        acc_a=acc_a, acc_b=acc_b,
        bbc_samples=int(bbc_samples),
    )


# ---------------------------------------------------------------------------
# geometry helpers (batched over leading axes; all indices static numpy)
# ---------------------------------------------------------------------------

def _capsuloid_segment(gtype_np, size_np, pos, quat):
    """Segment endpoints + radius for sphere/capsule geoms (static numpy
    type/size tables, traced poses). Capsule axis = local z."""
    r = jnp.asarray(size_np[..., 0], pos.dtype)
    hl = jnp.asarray(
        np.where(gtype_np == GEOM_CAPSULE, size_np[..., 1], 0.0), pos.dtype
    )
    axis = quat_rotate(quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], pos.dtype), pos.shape))
    p0 = pos - axis * hl[..., None]
    p1 = pos + axis * hl[..., None]
    return p0, p1, r


def _segment_closest(p0, p1, q0, q1, eps=1e-9):
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
    s = jnp.where(a > eps, jnp.clip((b * t - c) / jnp.maximum(a, eps), 0.0, 1.0), 0.0)
    return p0 + d1 * s[..., None], q0 + d2 * t[..., None]


def _point_to_box(point, box_pos, box_quat, half):
    """Closest feature between point and oriented box → (normal away from box,
    center depth (+inside), surface point). Branch-free."""
    lp = quat_rotate(
        jnp.concatenate([-box_quat[..., :3], box_quat[..., 3:]], -1), point - box_pos
    )
    clamped = jnp.clip(lp, -half, half)
    outside_vec = lp - clamped
    outside_dist = jnp.linalg.norm(outside_vec, axis=-1)
    is_outside = outside_dist > 1e-9
    face_dist = half - jnp.abs(lp)
    min_axis = jnp.argmin(face_dist, axis=-1)
    eye = jnp.eye(3, dtype=point.dtype)
    n_inside_local = eye[min_axis] * jnp.sign(
        jnp.take_along_axis(lp, min_axis[..., None], axis=-1)
    )
    d_inside = jnp.take_along_axis(face_dist, min_axis[..., None], axis=-1)[..., 0]
    n_outside_local = outside_vec / jnp.maximum(outside_dist, 1e-9)[..., None]
    n_local = jnp.where(is_outside[..., None], n_outside_local, n_inside_local)
    depth_center = jnp.where(is_outside, -outside_dist, d_inside)
    surf_local = jnp.where(
        is_outside[..., None], clamped, lp + n_inside_local * d_inside[..., None]
    )
    return (
        quat_rotate(box_quat, n_local),
        depth_center,
        box_pos + quat_rotate(box_quat, surf_local),
    )


_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
)  # (8,3)

# box-box sampling: corners alone miss edge-face and face-face contacts (a
# narrow gripper finger pressing a wider block face has NO vertex inside the
# other box); add face centers + edge midpoints → 26 sample points
_BOX_SAMPLES = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    + [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]]
    + [[0, sy, sz] for sy in (-1, 1) for sz in (-1, 1)]
    + [[sx, 0, sz] for sx in (-1, 1) for sz in (-1, 1)]
    + [[sx, sy, 0] for sx in (-1, 1) for sy in (-1, 1)],
    dtype=np.float32,
)  # (26,3)
N_BOX_SAMPLES = len(_BOX_SAMPLES)


def _box_corners(pos, quat, half):
    corners = jnp.asarray(_BOX_CORNERS, pos.dtype) * half[..., None, :]
    return pos[..., None, :] + quat_rotate(quat[..., None, :], corners)


def _box_samples(pos, quat, half):
    pts = jnp.asarray(_BOX_SAMPLES, pos.dtype) * half[..., None, :]
    return pos[..., None, :] + quat_rotate(quat[..., None, :], pts)


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
    """All contact forces for one env → (f_ext (B,6) Plücker world, net_cf (B,3))."""
    dt_ = body_pos.dtype
    nb = scene.nbody
    if tables.n_con == 0:
        return jnp.zeros((nb, 6), dt_), jnp.zeros((nb, 3), dt_), None
    tau_c = max(2.0 * dt_sub, 1e-3)
    zeta = 1.0

    # world poses of all geoms (static index gathers)
    gb_idx = scene.geom_body            # numpy
    gp = body_pos[gb_idx] + quat_rotate(body_quat[gb_idx], jnp.asarray(scene.geom_pos, dt_))
    gq = quat_mul(body_quat[gb_idx], jnp.asarray(scene.geom_quat, dt_))

    pts, nrms, dpths = [], [], []
    up = jnp.asarray([0.0, 0.0, 1.0], dt_)
    gtypes = scene.geom_type            # numpy
    sizes = np.asarray(scene.geom_size, np.float32)

    # ---- capsuloid vs plane (endpoint-major: all p0 then all p1) ----
    if len(tables.cp_geom):
        g = tables.cp_geom
        p0, p1, r = _capsuloid_segment(gtypes[g], sizes[g], gp[g], gq[g])
        for pend in (p0, p1):
            dpths.append(r - pend[..., 2])
            nrms.append(jnp.broadcast_to(up, pend.shape))
            pts.append(pend.at[..., 2].add(-r))

    # ---- box vs plane (corner-major) ----
    if len(tables.bp_geom):
        g = tables.bp_geom
        corners = _box_corners(gp[g], gq[g], jnp.asarray(sizes[g], dt_))  # (n,8,3)
        for ci in range(8):
            pt = corners[..., ci, :]
            dpths.append(-pt[..., 2])
            nrms.append(jnp.broadcast_to(up, pt.shape))
            pts.append(pt)

    # ---- capsuloid vs capsuloid ----
    if len(tables.cc_a):
        ga, gb = tables.cc_a, tables.cc_b
        pa0, pa1, ra = _capsuloid_segment(gtypes[ga], sizes[ga], gp[ga], gq[ga])
        pb0, pb1, rb = _capsuloid_segment(gtypes[gb], sizes[gb], gp[gb], gq[gb])
        ca, cb = _segment_closest(pa0, pa1, pb0, pb1)
        delta = ca - cb
        dist = jnp.linalg.norm(delta, axis=-1)
        normal = delta / jnp.maximum(dist, 1e-9)[..., None]
        depth = (ra + rb) - dist
        pts.append(cb + normal * (rb - 0.5 * jnp.maximum(depth, 0.0))[..., None])
        nrms.append(normal)
        dpths.append(depth)

    # ---- capsuloid vs box (point-major: p0, p1, closest) ----
    if len(tables.cb_cap):
        gc, gx = tables.cb_cap, tables.cb_box
        p0, p1, r = _capsuloid_segment(gtypes[gc], sizes[gc], gp[gc], gq[gc])
        half = jnp.asarray(sizes[gx], dt_)
        bc = gp[gx]
        cp_seg, _ = _segment_closest(p0, p1, bc, bc)
        for sp in (p0, p1, cp_seg):
            n_w, depth_c, surf = _point_to_box(sp, gp[gx], gq[gx], half)
            pts.append(surf)
            nrms.append(n_w)
            dpths.append(depth_c + r)

    # ---- box vs box (sample-major, A-in-B then B-in-A) ----
    if len(tables.bb_a):
        ga, gb = tables.bb_a, tables.bb_b
        ca = _box_samples(gp[ga], gq[ga], jnp.asarray(sizes[ga], dt_))
        cb = _box_samples(gp[gb], gq[gb], jnp.asarray(sizes[gb], dt_))
        for ci in range(N_BOX_SAMPLES):
            n_w, depth_c, surf = _point_to_box(ca[..., ci, :], gp[gb], gq[gb], jnp.asarray(sizes[gb], dt_))
            pts.append(surf); nrms.append(n_w); dpths.append(depth_c)
        for ci in range(N_BOX_SAMPLES):
            n_w, depth_c, surf = _point_to_box(cb[..., ci, :], gp[ga], gq[ga], jnp.asarray(sizes[ga], dt_))
            pts.append(surf); nrms.append(-n_w); dpths.append(depth_c)

    # ---- box vs box, reduced directional manifold (sample-major): corners
    # + face centers of bbc_a sampled against bbc_b; same sign convention as
    # the A-in-B block above (normal out of the host box, +force on geom a) ----
    if len(tables.bbc_a):
        ga, gb = tables.bbc_a, tables.bbc_b
        ca = _box_samples(gp[ga], gq[ga], jnp.asarray(sizes[ga], dt_))    # (n,26,3)
        for ci in range(tables.bbc_samples):
            n_w, depth_c, surf = _point_to_box(ca[..., ci, :], gp[gb], gq[gb], jnp.asarray(sizes[gb], dt_))
            pts.append(surf); nrms.append(n_w); dpths.append(depth_c)

    point = jnp.concatenate(pts)                   # (n_con, 3)
    normal = jnp.concatenate(nrms)
    depth = jnp.concatenate(dpths)

    # static per-candidate parameters
    kn = jnp.asarray(tables.kn_base / (tau_c * tau_c), dt_)
    kd = jnp.asarray(2.0 * zeta * tables.kn_base * tau_c / (tau_c * tau_c), dt_)
    fa = geom_friction_scale[tables.con_geom_a]
    fb_idx = np.where(tables.con_geom_b >= 0, tables.con_geom_b, tables.con_geom_a)
    fb = geom_friction_scale[fb_idx]
    mu = jnp.asarray(tables.mu_base, dt_) * 0.5 * (fa + fb)

    # contact-point velocities via static gathers (plane rows use body 0 of
    # acc_b == all-zero → velocity contribution masked by the matrix itself)
    ba = scene.geom_body[tables.con_geom_a]                        # numpy
    bb = scene.geom_body[fb_idx]
    has_b = jnp.asarray((tables.con_geom_b >= 0).astype(np.float32), dt_)

    def point_vel(bidx, p):
        return body_linvel[bidx] + jnp.cross(body_angvel[bidx], p - body_pos[bidx])

    v_rel = point_vel(ba, point) - point_vel(bb, point) * has_b[..., None]
    vn = jnp.sum(v_rel * normal, -1)
    vt = v_rel - vn[..., None] * normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)

    active = depth > 0.0
    depth_c = jnp.minimum(depth, jnp.asarray(scene.max_contact_depth, dt_))
    eps_v = jnp.asarray(scene.friction_smoothing_vel, dt_)

    def force_with(kn_arr, kd_arr):
        fn = jnp.where(active, jnp.maximum(kn_arr * depth_c - kd_arr * vn, 0.0), 0.0)
        ft = -(mu * fn / jnp.maximum(vt_norm, eps_v))[..., None] * vt
        return fn[..., None] * normal + ft, fn

    # side-asymmetric penalty: stiff (couple) stiffness felt by fixed bodies,
    # mass-scaled (stable) stiffness felt by free bodies. The DYNAMIC
    # articulated side of a couple contact gets NO explicit force here — an
    # explicit stiff spring-damper on a 15 g finger is unconditionally
    # unstable (500 N kicks at contact onset); its reaction is applied
    # IMPLICITLY inside the articulated velocity solve (stacked_substep adds
    # dt(kd+dt·kn)·JᵀJ to the mass matrix), which is what lets grippers grasp.
    kn_soft = jnp.asarray(tables.kn_base_soft / (tau_c * tau_c), dt_)
    kd_soft = 2.0 * zeta * jnp.asarray(tables.kn_base_soft / tau_c, dt_)
    force_stiff, fn_stiff = force_with(kn, kd)
    force_soft, _ = force_with(kn_soft, kd_soft)
    af = jnp.asarray(tables.a_free, dt_)[:, None]
    bf = jnp.asarray(tables.b_free, dt_)[:, None]
    a_cpl = jnp.asarray(tables.a_art, dt_)[:, None]
    b_cpl = jnp.asarray(tables.b_art, dt_)[:, None]
    force_a = jnp.where(af > 0, force_soft, jnp.where(a_cpl > 0, 0.0, force_stiff))
    force_b = jnp.where(bf > 0, force_soft, jnp.where(b_cpl > 0, 0.0, force_stiff))
    plk_a = jnp.concatenate([jnp.cross(point, force_a), force_a], axis=-1)
    plk_b = jnp.concatenate([jnp.cross(point, force_b), force_b], axis=-1)

    import jax

    P = jax.lax.Precision.HIGHEST
    f_ext = jnp.matmul(jnp.asarray(tables.acc_a, dt_), plk_a, precision=P) - jnp.matmul(
        jnp.asarray(tables.acc_b, dt_), plk_b, precision=P
    )
    # REPORTED net contact force: the STATIC side of a free↔static pair
    # mirrors the free side's soft force (Newton's reaction of what is
    # PHYSICALLY applied) instead of the stiff bookkeeping spring. The stiff
    # value is never applied to the free body (it feels the soft spring + the
    # impulse pass), and on a fixed body it has no dynamic effect at all —
    # but objectives read it: the omni_panda_pick collision term saw ~350 N
    # table-force transients during a squeeze (a ~3 mm pressed-down block ×
    # couple stiffness) and vetoed every grasp the planner sampled (r5 root
    # cause). PhysX reports the physical reaction there (~1 N scale).
    # Impulse-pass reactions for these rows are added in impulse_contact_pass.
    free_np = _free_body_mask(scene)
    art_np = _articulated_body_mask(scene)
    sta_np = 1.0 - np.maximum(free_np, art_np)
    ba_np = scene.geom_body[tables.con_geom_a]
    fb_np = np.where(tables.con_geom_b >= 0, tables.con_geom_b, tables.con_geom_a)
    bb_np = scene.geom_body[fb_np]
    a_sta_free = (sta_np[ba_np] > 0) & (tables.b_free > 0)
    b_sta_free = (sta_np[bb_np] > 0) & (tables.a_free > 0) & (tables.con_geom_b >= 0)
    rep_a = jnp.where(jnp.asarray(a_sta_free)[:, None], force_soft, force_a)
    rep_b = jnp.where(jnp.asarray(b_sta_free)[:, None], force_soft, force_b)
    net_cf = jnp.matmul(jnp.asarray(tables.acc_a, dt_), rep_a, precision=P) - jnp.matmul(
        jnp.asarray(tables.acc_b, dt_), rep_b, precision=P
    )
    # fn_stiff rides along for COUPLE candidates (articulated↔free — the
    # impulse pass seeds its friction cone with the actual normal force the
    # articulated side exerts; a pinched light body otherwise sees only
    # impulse-scale friction caps and squirts out of grasps) and for
    # ART↔STATIC stiction candidates (their normal never enters the impulse
    # pass, so fn_stiff is their ONLY cone cap — feet would otherwise have a
    # zero friction budget and keep skating). FREE-body ground contacts keep
    # impulse-derived caps — seeding those over-grips the floor.
    couple = jnp.asarray(
        (((tables.a_free > 0) != (tables.b_free > 0)) & (tables.con_geom_b >= 0))
        | (tables.a_sta > 0) | (tables.b_sta > 0),
        dt_,
    )
    contact_geom = {"point": point, "normal": normal, "depth": depth, "mu": mu,
                    "fn_stiff": fn_stiff * couple}
    return f_ext, net_cf, contact_geom


# ---------------------------------------------------------------------------
# impulse pass for free rigid bodies
# ---------------------------------------------------------------------------

def _free_body_mask(scene: SceneModel) -> np.ndarray:
    """(B,) 1.0 where the body is a free single-rigid-body actor."""
    mask = np.zeros(scene.nbody, np.float32)
    for ai, a in enumerate(scene.actors):
        if a.ndof == 0 and not a.fixed_base:
            mask[scene.body_offset[ai]] = 1.0
    return mask


def _articulated_body_mask(scene: SceneModel) -> np.ndarray:
    """(B,) 1.0 where the body belongs to a DYNAMIC articulated actor (one
    that participates in the generalized solve and is not a free single rigid
    body) — these sides can join the impulse pass via J M⁻¹ Jᵀ."""
    mask = np.zeros(scene.nbody, np.float32)
    for ai, a in enumerate(scene.actors):
        if a.ndof > 0 or (not a.fixed_base and a.nbody > 1):
            o = scene.body_offset[ai]
            mask[o : o + a.nbody] = 1.0
    return mask


def impulse_contact_pass(
    scene: SceneModel,
    tables: ContactTables,
    contact_geom,
    body_pos,
    body_quat,
    body_linvel,        # (B,3) POST-solve velocities (articulated: this substep)
    body_angvel,
    mass_scale,         # (B,) DR multipliers
    dt: float,
    iters: int = 16,
    beta: float = 0.2,
    slop: float = 2e-3,
    psi=None,           # (B,6,6) articulated operational-space inverse inertia
    art_apply=None,     # (Y (B,6)) -> ΔV (B,6) exact generalized response
    lam_warm=None,      # (n_con,4) [λ_n, λ_t] persistent-contact warm start
):
    """Velocity-impulse contact resolution for free rigid bodies, with
    optional TWO-WAY coupling to articulated actors.

    The compliant penalty law scales stiffness with effective mass, which is
    correct for settling but cannot resist actuation: a 70 N gripper drive
    crushes through a 1-gram block whose pair stiffness is ~0.4 N/m (the
    reference's PhysX solves contacts as constraints and has no such limit —
    grasping depends on it). This pass treats contacts of free single-rigid
    bodies as velocity-level constraints: Jacobi-relaxed projected impulses
    with Baumgarte stabilization and a friction cone — unconditionally stable
    and mass-independent.

    When `psi` is given, articulated↔free contacts (tables.a_art/b_art) are
    solved two-way: the articulated side contributes its joint-space effective
    mass Xᵀ(Φ M⁻¹ Φᵀ)X (Ψ = Φ M⁻¹ Φᵀ precomputed per contact link by the
    caller from the SAME damped mass matrix as the velocity solve), its
    contact-point velocity is updated by Ψ·Y every iteration, and the total
    spatial impulse per link is returned so the caller can fold ΔU = M⁻¹ΦᵀY
    back into the generalized velocities. Without `psi`, articulated/fixed
    bodies act kinematically (round-1 behavior — corner-first squeezes could
    eject a grasped block).

    When `lam_warm` is given, the pass warm-starts from the previous substep's
    converged impulses (PhysX-style persistent contacts — candidates are a
    static table, so row c is always the same pair). Essential for grasp
    transport: cold-started Jacobi leaves a ~3% stiction residual of the
    per-substep gravity kick (≈6 mm/s drift) that walks a held block off the
    finger pads; warm-started, the residual decays across substeps instead.

    Returns (new_linvel (B,3), new_angvel (B,3), net_cf (B,3), Y_total (B,6),
    lam_out (n_con,4)).
    """
    dt_ = body_pos.dtype
    B = scene.nbody
    if contact_geom is None or tables.n_con == 0:
        return (body_linvel, body_angvel, jnp.zeros_like(body_pos),
                jnp.zeros((B, 6), dt_), jnp.zeros((tables.n_con, 4), dt_))
    free = _free_body_mask(scene)
    ba = scene.geom_body[tables.con_geom_a]                   # static (n,)
    fb_idx = np.where(tables.con_geom_b >= 0, tables.con_geom_b, tables.con_geom_a)
    bb = scene.geom_body[fb_idx]
    has_b = (tables.con_geom_b >= 0).astype(np.float32)
    a_free = free[ba]                                         # static (n,)
    b_free = free[bb] * has_b
    if psi is not None:
        # articulated participation: two-way couple (art↔free) plus
        # friction-only stiction (art↔static, the foot-skating fix)
        a_art = np.maximum(tables.a_art, tables.a_sta)
        b_art = np.maximum(tables.b_art, tables.b_sta)
    else:
        a_art = np.zeros_like(a_free)
        b_art = np.zeros_like(b_free)
    is_sta = np.maximum(tables.a_sta, tables.b_sta) if psi is not None else np.zeros_like(a_free)
    touched = (a_free + b_free + a_art + b_art) > 0
    if not touched.any():
        return (body_linvel, body_angvel, jnp.zeros_like(body_pos),
                jnp.zeros((B, 6), dt_), jnp.zeros((tables.n_con, 4), dt_))

    point = contact_geom["point"]
    normal = contact_geom["normal"]
    depth = jnp.minimum(contact_geom["depth"], scene.max_contact_depth)
    mu = contact_geom["mu"]
    fn_seed = contact_geom.get("fn_stiff", jnp.zeros_like(depth))
    active = (depth > 0.0) & jnp.asarray(touched)

    # inverse mass / world inverse inertia per body (free bodies only)
    inv_m = np.zeros(B, np.float32)
    I_loc = np.zeros((B, 3, 3), np.float32)
    for ai, a in enumerate(scene.actors):
        if a.ndof == 0 and not a.fixed_base:
            b = scene.body_offset[ai]
            inv_m[b] = 1.0 / max(float(a.mass[0]), 1e-6)
            I_loc[b] = np.linalg.inv(a.inertia[0] + np.eye(3) * 1e-9)
    inv_m_t = jnp.asarray(inv_m) / jnp.maximum(mass_scale, 1e-6)
    from .math3d import quat_to_matrix

    R = quat_to_matrix(body_quat)
    inv_I_w = jnp.einsum(
        "bij,bjk,blk->bil", R, jnp.asarray(I_loc), R,
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.maximum(mass_scale, 1e-6)[:, None, None]

    r_a = point - body_pos[ba]
    r_b = point - body_pos[bb]
    amask = jnp.asarray(a_free, dt_)
    bmask = jnp.asarray(b_free, dt_)
    amask_art = jnp.asarray(a_art, dt_)
    bmask_art = jnp.asarray(b_art, dt_)

    def k_dir(d):
        """effective inverse mass along direction d (n,3)."""
        ka = inv_m_t[ba] + jnp.einsum(
            "ni,nij,nj->n", jnp.cross(r_a, d), inv_I_w[ba], jnp.cross(r_a, d),
            precision=jax.lax.Precision.HIGHEST,
        )
        kb = inv_m_t[bb] + jnp.einsum(
            "ni,nij,nj->n", jnp.cross(r_b, d), inv_I_w[bb], jnp.cross(r_b, d),
            precision=jax.lax.Precision.HIGHEST,
        )
        k = amask * ka + bmask * kb
        if psi is not None:
            # articulated side: k = XᵀΨX with X = (p×d, d) about world origin
            X = jnp.concatenate([jnp.cross(point, d), d], -1)     # (n,6)
            k = k + amask_art * jnp.einsum(
                "ni,nij,nj->n", X, psi[ba], X,
                precision=jax.lax.Precision.HIGHEST,
            )
            k = k + bmask_art * jnp.einsum(
                "ni,nij,nj->n", X, psi[bb], X,
                precision=jax.lax.Precision.HIGHEST,
            )
        return k

    k_n = jnp.maximum(k_dir(normal), 1e-9)
    # depenetration velocity cap: an over-constrained pinch (gripper vice +
    # table) otherwise escalates the escape velocity without bound
    target = jnp.minimum(beta * jnp.maximum(depth - slop, 0.0) / dt, 0.5)

    # one-hot accumulators (B, n) for velocity updates (free sides only)
    A_a = jnp.asarray(tables.acc_a, dt_) * jnp.asarray(a_free, dt_)[None, :]
    A_b = jnp.asarray(tables.acc_b, dt_) * jnp.asarray(b_free, dt_)[None, :]

    lin = body_linvel
    ang = body_angvel
    # mass-splitting Jacobi: scale each contact's effective mass by the number
    # of active contacts on its body, then relax ≈ 1 — converges like
    # Gauss–Seidel on symmetric manifolds (plain Jacobi diverges or crawls on
    # 4/8-corner stacks)
    relax = 0.9
    A_a_bin = jnp.asarray(tables.acc_a, dt_)
    A_b_bin = jnp.asarray(tables.acc_b, dt_)
    A_a_art = A_a_bin * amask_art[None, :]
    A_b_art = A_b_bin * bmask_art[None, :]
    Y_total = jnp.zeros((B, 6), dt_)

    # articulated mass-splitting must count per ACTOR, not per body: four
    # feet couple through the shared floating base, so per-body counts let
    # the base receive ~4× the correction per Jacobi iteration — a standing
    # quadruped's stiction then pumps the base into a runaway slide
    art_act_idx = np.zeros(tables.n_con, np.int64)
    A_act = np.zeros((scene.nactor, tables.n_con), np.float32)
    for c_ in range(tables.n_con):
        if a_art[c_] > 0:
            aid_ = int(scene.body_actor[ba[c_]])
        elif b_art[c_] > 0:
            aid_ = int(scene.body_actor[bb[c_]])
        else:
            continue
        art_act_idx[c_] = aid_
        A_act[aid_, c_] = 1.0
    A_act_j = jnp.asarray(A_act)
    amask_art_any = jnp.asarray(np.maximum(a_art, b_art), dt_)

    def apply_imp(imp, lin, ang, Y_total):
        """Apply per-candidate world impulses (n,3) at `point` to free bodies
        (A gets +imp, B gets −imp) and articulated links (two-way reaction)."""
        dlin = (
            jnp.matmul(A_a, imp, precision=jax.lax.Precision.HIGHEST)
            - jnp.matmul(A_b, imp, precision=jax.lax.Precision.HIGHEST)
        ) * inv_m_t[:, None]
        tor_a = jnp.cross(r_a, imp)
        tor_b = jnp.cross(r_b, -imp)
        dang_t = (
            jnp.matmul(A_a, tor_a, precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(A_b, tor_b, precision=jax.lax.Precision.HIGHEST)
        )
        dang = jnp.einsum(
            "bij,bj->bi", inv_I_w, dang_t, precision=jax.lax.Precision.HIGHEST
        )
        lin = lin + dlin
        ang = ang + dang
        if psi is not None:
            # two-way: articulated links absorb the REACTION. Velocity update
            # via the EXACT generalized response ΔU = M⁻¹ΦᵀY when the caller
            # provides it (cross-link/cross-joint coupling matters: with only
            # the per-link Ψ, a grasped block slips ~35% of the hand velocity
            # because the two fingers' impulses don't see each other); Ψ is
            # still used for the per-candidate effective mass.
            Yimp = jnp.concatenate([jnp.cross(point, imp), imp], -1)   # (n,6)
            Y_iter = jnp.matmul(A_a_art, Yimp, precision=jax.lax.Precision.HIGHEST) - jnp.matmul(
                A_b_art, Yimp, precision=jax.lax.Precision.HIGHEST
            )                                                           # (B,6)
            Y_total = Y_total + Y_iter
            if art_apply is not None:
                dV = art_apply(Y_iter)
            else:
                dV = jnp.einsum(
                    "bij,bj->bi", psi, Y_iter, precision=jax.lax.Precision.HIGHEST
                )
            dw = dV[:, :3]
            lin = lin + dV[:, 3:] + jnp.cross(dw, body_pos)
            ang = ang + dw
        return lin, ang, Y_total

    # warm start: re-apply last substep's converged impulses on currently
    # active candidates, then let the iterations correct the (small) error
    if lam_warm is not None:
        act0 = active.astype(dt_)
        lam_n = lam_warm[:, 0] * act0
        lam_t = lam_warm[:, 1:4] * act0[:, None]
        lin, ang, Y_total = apply_imp(
            normal * lam_n[:, None] + lam_t, lin, ang, Y_total
        )
    else:
        lam_n = jnp.zeros(tables.n_con, dt_)
        lam_t = jnp.zeros((tables.n_con, 3), dt_)

    for _ in range(iters):
        va = lin[ba] + jnp.cross(ang[ba], r_a)
        vb = lin[bb] + jnp.cross(ang[bb], r_b)
        v_rel = va - vb * jnp.asarray(has_b, dt_)[:, None]
        vn = jnp.sum(v_rel * normal, -1)
        act_f = active.astype(dt_)
        count = jnp.matmul(A_a_bin, act_f, precision=jax.lax.Precision.HIGHEST) + jnp.matmul(
            A_b_bin, act_f, precision=jax.lax.Precision.HIGHEST
        )
        count_act = jnp.matmul(A_act_j, act_f, precision=jax.lax.Precision.HIGHEST)
        n_eff = jnp.maximum(
            amask * count[ba] + bmask * count[bb]
            + amask_art_any * count_act[art_act_idx], 1.0
        )
        # art↔static stiction candidates are FRICTION-ONLY: their normal is
        # already carried by the stiff penalty (an impulse on top would
        # double-count the support force)
        d_lam = jnp.where(
            active & (jnp.asarray(is_sta, dt_) == 0.0),
            -(vn - target) / (k_n * n_eff) * relax, 0.0,
        )
        new_lam = jnp.maximum(lam_n + d_lam, 0.0)
        d_imp = new_lam - lam_n
        lam_n = new_lam
        imp = normal * d_imp[:, None]
        # friction: tangential impulse, cone-projected against λ_n. No
        # under-relaxation here: stiction must converge tightly or a grasped
        # object drifts through the pads a few mm per second (n_eff splitting
        # already tempers the multi-contact overshoot)
        vt = v_rel - vn[:, None] * normal
        k_t = jnp.maximum(k_dir(vt / jnp.maximum(jnp.linalg.norm(vt, axis=-1, keepdims=True), 1e-9)), 1e-9)
        jt = jnp.where(active[:, None], -vt / (k_t * n_eff)[:, None], 0.0)
        lam_t_new = lam_t + jt
        lt_norm = jnp.linalg.norm(lam_t_new, axis=-1)
        cap = mu * (lam_n + fn_seed * dt)
        scale = jnp.minimum(1.0, cap / jnp.maximum(lt_norm, 1e-9))
        lam_t_new = lam_t_new * scale[:, None]
        jt = lam_t_new - lam_t
        lam_t = lam_t_new
        imp = imp + jt
        lin, ang, Y_total = apply_imp(imp, lin, ang, Y_total)

    if psi is not None and (a_art + b_art).any():
        # ---- stiction snap (couple contacts only) ----
        # Iterative friction leaves a ~1% tangential residual that walks a
        # grasped body across the pads (mm/s — enough to lose a grasp over a
        # 10 s transport). For contacts strictly INSIDE the cone the exact
        # stiction solution is zero relative tangential velocity, so finish
        # with one direct 6×6 least-squares per free body matching its rigid
        # motion to the articulated side at all sticking couple points. The
        # arm-side reaction is O(m_free)·Δv — for grasped objects (g-scale
        # masses vs kg-scale arms) it is below solver tolerance and omitted.
        va = lin[ba] + jnp.cross(ang[ba], r_a)
        vb_ = lin[bb] + jnp.cross(ang[bb], r_b)
        v_rel = va - vb_ * jnp.asarray(has_b, dt_)[:, None]
        lt_norm = jnp.linalg.norm(lam_t, axis=-1)
        cap = mu * (lam_n + fn_seed * dt)
        stick = (lt_norm < 0.98 * cap) & active
        # static candidate routing: which side is the free body
        couple_a_np = (np.asarray(a_free) > 0) & (np.asarray(b_art) > 0)
        couple_b_np = (np.asarray(b_free) > 0) & (np.asarray(a_art) > 0)
        couple_np = couple_a_np | couple_b_np
        body_free_np = np.where(couple_a_np, ba, bb)
        O_snap = np.zeros((B, tables.n_con), np.float32)
        O_snap[body_free_np[couple_np], np.arange(tables.n_con)[couple_np]] = 1.0
        w = jnp.where(stick & jnp.asarray(couple_np), 1.0, 0.0)
        e_snap = jnp.asarray(np.where(couple_a_np, 1.0, -1.0).astype(np.float32))
        r_free = jnp.where(jnp.asarray(couple_a_np)[:, None], r_a, r_b)

        # X_c (3,6): point-velocity map of the free body, ξ = (Δω, Δv_com)
        def _skew(v):
            z = jnp.zeros_like(v[..., 0])
            return jnp.stack([
                jnp.stack([z, -v[..., 2], v[..., 1]], -1),
                jnp.stack([v[..., 2], z, -v[..., 0]], -1),
                jnp.stack([-v[..., 1], v[..., 0], z], -1),
            ], -2)

        X_snap = jnp.concatenate(
            [-_skew(r_free),
             jnp.broadcast_to(jnp.eye(3, dtype=dt_), (tables.n_con, 3, 3))], -1
        )                                                              # (n,3,6)
        P = jnp.eye(3, dtype=dt_)[None] - normal[:, :, None] * normal[:, None, :]
        XP = jnp.einsum("nij,nik->njk", X_snap, P,
                        precision=jax.lax.Precision.HIGHEST)           # XᵀP (n,6,3)
        A_c = jnp.einsum("njk,nkl->njl", XP, X_snap,
                         precision=jax.lax.Precision.HIGHEST)          # (n,6,6)
        b_c = -jnp.einsum("njk,nk->nj", XP, e_snap[:, None] * v_rel,
                          precision=jax.lax.Precision.HIGHEST)
        Ow = jnp.asarray(O_snap) * w[None, :]                          # (B,n)
        A_acc = jnp.einsum("bn,njk->bjk", Ow, A_c, precision=jax.lax.Precision.HIGHEST)
        b_acc = jnp.einsum("bn,nj->bj", Ow, b_c, precision=jax.lax.Precision.HIGHEST)
        nstick = jnp.sum(Ow, axis=-1)
        A_reg = A_acc + jnp.eye(6, dtype=dt_)[None] * 1e-4
        xi = jnp.linalg.solve(A_reg, b_acc[..., None])[..., 0]         # (B,6)
        gate = (nstick > 0).astype(dt_)[:, None] * jnp.asarray(free, dt_)[:, None]
        # the snap only finishes CONVERGENCE (mm/s-scale Jacobi residuals);
        # clamp hard so it can never act as an energy-injecting constraint
        # when v_rel is genuinely large (impact, fresh contact)
        xi = jnp.clip(xi, -0.05, 0.05) * gate
        ang = ang + xi[:, :3]
        lin = lin + xi[:, 3:]

    lin = jnp.clip(lin, -scene.max_root_linvel, scene.max_root_linvel)
    ang = jnp.clip(ang, -scene.max_root_angvel, scene.max_root_angvel)
    imp_tot = normal * lam_n[:, None] + lam_t
    # STATIC bodies also REPORT the reaction of impulses their free partner
    # received (no dynamic effect — they never move): a resting block's
    # weight-bearing λ then shows up on the table's net_cf at the physical
    # ~1 N scale (PhysX parity; objectives read these forces)
    sta_np2 = 1.0 - np.maximum(free, _articulated_body_mask(scene))
    a_sta_rep = jnp.asarray((sta_np2[ba] > 0) & (np.asarray(b_free) > 0), dt_)
    b_sta_rep = jnp.asarray((sta_np2[bb] > 0) & (np.asarray(a_free) > 0)
                            & (tables.con_geom_b >= 0), dt_)
    net_cf_imp = (
        jnp.matmul(jnp.asarray(tables.acc_a, dt_) * (amask + amask_art + a_sta_rep)[None, :],
                   imp_tot, precision=jax.lax.Precision.HIGHEST)
        - jnp.matmul(jnp.asarray(tables.acc_b, dt_) * (bmask + bmask_art + b_sta_rep)[None, :],
                     imp_tot, precision=jax.lax.Precision.HIGHEST)
    ) / dt
    lam_out = jnp.concatenate([lam_n[:, None], lam_t], axis=-1)
    return lin, ang, net_cf_imp, Y_total, lam_out


import jax  # noqa: E402
