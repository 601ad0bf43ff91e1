"""The physics substep in component ("lanes") form for the fused Pallas kernel.

Semantically IDENTICAL to the XLA engine (physics/stacked.py + contact.py):
same FK, same world-frame Plücker CRBA/RNEA, same implicit drives, same
compliant contact law, same integrator — unit tests compare the two paths
state-for-state. The difference is purely representational: every scalar is an
(8,128) tile of MPPI samples, every loop is unrolled python, so the WHOLE
substep lowers to one straight-line VPU program inside a single kernel (the
XLA path pays ~20µs of launch overhead per fusion on this backend; here the
only launch is the enclosing rollout kernel).

State layout (python dict of tiles / tuples of tiles):
  root_pos[a], root_quat[a], root_linvel[a], root_angvel[a]  per actor
  q[d], qd[d]                                                per actuated dof
Extras produced per substep: body_pos/quat/linvel/angvel per body, net contact
force per body (for cost terms).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.model import (
    DRIVE_EFFORT,
    DRIVE_POSITION,
    DRIVE_VELOCITY,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
)
from ...physics.urdf import GEOM_BOX, GEOM_CAPSULE
from . import lanes as L

# debug toggle: disable the articulated side of the GS sweeps (implicit couple
# solve stays on) — lets tests bisect two-way-sweep regressions
TWO_WAY_SWEEPS = True
DEBUG_SWEEPS = False    # eager-mode per-candidate prints (tests only)


def _t3(a):
    return (float(a[0]), float(a[1]), float(a[2]))


def _t4(a):
    return (float(a[0]), float(a[1]), float(a[2]), float(a[3]))


class LaneView:
    """State access for kernel cost terms (per-substep snapshot)."""

    def __init__(self, scene, pos, quat, linv, angv, ncf, q, qd, root_pos, root_quat, root_linv):
        self.scene = scene
        self._pos, self._quat = pos, quat
        self._linv, self._angv = linv, angv
        self._ncf = ncf
        self.q, self.qd = q, qd
        self._root_pos, self._root_quat, self._root_linv = root_pos, root_quat, root_linv

    def body_pos(self, link, actor=None):
        return self._pos[self.scene.body_index(link, actor)]

    def body_quat(self, link, actor=None):
        return self._quat[self.scene.body_index(link, actor)]

    def actor_pos(self, name):
        return self._root_pos[self.scene.actor_index(name)]

    def actor_pos_by_index(self, ai: int):
        """Root position by actor index — needed when several actors share a
        name (multi-robot scenes, e.g. two `jackal` actors)."""
        return self._root_pos[ai]

    def actor_quat(self, name):
        return self._root_quat[self.scene.actor_index(name)]

    def actor_linvel(self, name):
        return self._root_linv[self.scene.actor_index(name)]

    def actor_net_cf(self, name):
        ai = self.scene.actor_index(name)
        o = self.scene.body_offset[ai]
        n = self.scene.actors[ai].nbody
        f = (0.0, 0.0, 0.0)
        for b in range(o, o + n):
            f = L.add3(f, self._ncf[b])
        return f

    def actor_q(self, name):
        sl = self.scene.actor_dof_slice(name)
        return self.q[sl]

    def actor_qd(self, name):
        sl = self.scene.actor_dof_slice(name)
        return self.qd[sl]


def fk_lanes(scene, state):
    """→ (pos[b] 3-tuples, quat[b] 4-tuples, linv[b], angv[b], axis_w[b])."""
    B = scene.nbody
    pos: List = [None] * B
    quat: List = [None] * B
    linv: List = [None] * B
    angv: List = [None] * B
    axis_w: List = [None] * B
    for ai, art in enumerate(scene.actors):
        bo = scene.body_offset[ai]
        do = scene.dof_offset[ai]
        for i in range(art.nbody):
            g = bo + i
            if art.parent[i] < 0:
                pos[g] = state["root_pos"][ai]
                quat[g] = state["root_quat"][ai]
                linv[g] = state["root_linvel"][ai]
                angv[g] = state["root_angvel"][ai]
                axis_w[g] = (1.0, 0.0, 0.0)
                continue
            p = bo + int(art.parent[i])
            jp = _t3(art.jpos[i])
            jq = _t4(art.jquat[i])
            ax = _t3(art.jaxis[i])
            fpos = L.add3(pos[p], L.qrot(quat[p], jp))
            fq = L.qmul(quat[p], jq)
            vf = L.add3(linv[p], L.cross3(angv[p], L.sub3(fpos, pos[p])))
            jt = int(art.jtype[i])
            if jt == JOINT_REVOLUTE:
                k = do + int(art.dof_index[i])
                rotq = L.q_axis_angle(ax, state["q"][k])
                aw = L.qrot(fq, ax)
                pos[g] = fpos
                quat[g] = L.qmul(fq, rotq)
                angv[g] = L.fma3(angv[p], aw, state["qd"][k])
                linv[g] = vf
                axis_w[g] = aw
            elif jt == JOINT_PRISMATIC:
                k = do + int(art.dof_index[i])
                aw = L.qrot(fq, ax)
                bp = L.fma3(fpos, aw, state["q"][k])
                pos[g] = bp
                quat[g] = fq
                angv[g] = angv[p]
                linv[g] = L.fma3(
                    L.add3(vf, L.cross3(angv[p], L.sub3(bp, fpos))), aw, state["qd"][k]
                )
                axis_w[g] = aw
            else:  # fixed
                pos[g] = fpos
                quat[g] = fq
                angv[g] = angv[p]
                linv[g] = vf
                axis_w[g] = (1.0, 0.0, 0.0)
    return pos, quat, linv, angv, axis_w


# ---------------------------------------------------------------------------
# contacts (mirrors physics/contact.py candidate enumeration + force law)
# ---------------------------------------------------------------------------

def _point_to_box_lanes(point, box_pos, box_quat, half):
    """Mirror of contact._point_to_box in component form."""
    lp = L.qrot_inv(box_quat, L.sub3(point, box_pos))
    cl = tuple(jnp.clip(lp[i], -half[i], half[i]) for i in range(3))
    ov = L.sub3(lp, cl)
    od = L.norm3(ov, eps=0.0)
    is_out = od > 1e-9
    fd = tuple(half[i] - jnp.abs(lp[i]) for i in range(3))
    # inside: min face
    m01 = jnp.minimum(fd[0], fd[1])
    dmin = jnp.minimum(m01, fd[2])
    sel0 = fd[0] <= jnp.minimum(fd[1], fd[2])
    sel1 = (~sel0) & (fd[1] <= fd[2])
    sel2 = ~(sel0 | sel1)
    sgn = tuple(jnp.sign(lp[i]) for i in range(3))
    n_in = (
        jnp.where(sel0, sgn[0], 0.0),
        jnp.where(sel1, sgn[1], 0.0),
        jnp.where(sel2, sgn[2], 0.0),
    )
    inv_od = 1.0 / jnp.maximum(od, 1e-9)
    n_out = L.scale3(ov, inv_od)
    n_loc = tuple(jnp.where(is_out, n_out[i], n_in[i]) for i in range(3))
    depth_c = jnp.where(is_out, -od, dmin)
    surf_loc = tuple(
        jnp.where(is_out, cl[i], lp[i] + n_in[i] * dmin) for i in range(3)
    )
    n_w = L.qrot(box_quat, n_loc)
    surf_w = L.add3(box_pos, L.qrot(box_quat, surf_loc))
    return n_w, depth_c, surf_w


def _segment_closest_lanes(p0, p1, q0, q1, eps=1e-9):
    d1 = L.sub3(p1, p0)
    d2 = L.sub3(q1, q0)
    r = L.sub3(p0, q0)
    a = L.dot3(d1, d1)
    e = L.dot3(d2, d2)
    f = L.dot3(d2, r)
    c = L.dot3(d1, r)
    b = L.dot3(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > eps, jnp.clip((b * f - c * e) / jnp.maximum(denom, eps), 0.0, 1.0), 0.0)
    t = jnp.where(e > eps, jnp.clip((b * s + f) / jnp.maximum(e, eps), 0.0, 1.0), 0.0)
    s = jnp.where(a > eps, jnp.clip((b * t - c) / jnp.maximum(a, eps), 0.0, 1.0), 0.0)
    return L.fma3(p0, d1, s), L.fma3(q0, d2, t)


_BOX_CORNER_SIGNS = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
from ...physics.contact import _BOX_SAMPLES, N_BOX_SAMPLES, N_BBC_SAMPLES  # noqa: E402



def _geom_pose(scene, g, pos, quat):
    b = int(scene.geom_body[g])
    gp = L.add3(pos[b], L.qrot(quat[b], _t3(scene.geom_pos[g])))
    gqq = L.qmul(quat[b], _t4(scene.geom_quat[g]))
    return gp, gqq


def _geom_segment(scene, g, pos, quat):
    gp, gqq = _geom_pose(scene, g, pos, quat)
    gt = int(scene.geom_type[g])
    r = float(scene.geom_size[g][0])
    hl = float(scene.geom_size[g][1]) if gt == GEOM_CAPSULE else 0.0
    axis = L.qrot(gqq, (0.0, 0.0, 1.0))
    return L.fma3(gp, axis, -hl), L.fma3(gp, axis, hl), r


def _box_sample_point(scene, g, ci, pos, quat):
    gp, gqq = _geom_pose(scene, g, pos, quat)
    half = _t3(scene.geom_size[g])
    sx, sy, sz = _BOX_SAMPLES[ci]
    local = (float(sx) * half[0], float(sy) * half[1], float(sz) * half[2])
    return L.add3(gp, L.qrot(gqq, local))


def candidate_geometry(scene, ga, gb, kind, extra, pos, quat):
    """(point, normal, depth) for one static candidate descriptor, recomputed
    from body poses — used by the impulse sweeps so per-candidate tiles never
    stay live across the whole contact section (VMEM stack pressure)."""
    if kind == "cp0":
        (which,) = extra
        p0, p1, r = _geom_segment(scene, ga, pos, quat)
        pend = p0 if which == 0 else p1
        return (pend[0], pend[1], pend[2] - r), (0.0, 0.0, 1.0), r - pend[2]
    if kind == "bp":
        (ci,) = extra
        pt = _box_sample_point(scene, ga, ci, pos, quat)
        return pt, (0.0, 0.0, 1.0), -pt[2]
    if kind == "cc":
        pa0, pa1, ra = _geom_segment(scene, ga, pos, quat)
        pb0, pb1, rb = _geom_segment(scene, gb, pos, quat)
        ca, cb = _segment_closest_lanes(pa0, pa1, pb0, pb1)
        delta = L.sub3(ca, cb)
        dist = L.norm3(delta, eps=0.0)
        normal = L.scale3(delta, 1.0 / jnp.maximum(dist, 1e-9))
        depth = (ra + rb) - dist
        point = L.fma3(cb, normal, rb - 0.5 * jnp.maximum(depth, 0.0))
        return point, normal, depth
    if kind == "cb":
        (which,) = extra
        p0, p1, r = _geom_segment(scene, ga, pos, quat)
        gp_b, gq_b = _geom_pose(scene, gb, pos, quat)
        half = _t3(scene.geom_size[gb])
        if which == 0:
            sp = p0
        elif which == 1:
            sp = p1
        else:
            sp, _ = _segment_closest_lanes(p0, p1, gp_b, gp_b)
        n_w, depth_c, surf = _point_to_box_lanes(sp, gp_b, gq_b, half)
        return surf, n_w, depth_c + r
    if kind in ("bbA", "bbc"):
        (ci,) = extra
        pt = _box_sample_point(scene, ga, ci, pos, quat)
        gp_b, gq_b = _geom_pose(scene, gb, pos, quat)
        n_w, depth_c, surf = _point_to_box_lanes(pt, gp_b, gq_b, _t3(scene.geom_size[gb]))
        return surf, n_w, depth_c
    # bbB
    (ci,) = extra
    pt = _box_sample_point(scene, gb, ci, pos, quat)
    gp_a, gq_a = _geom_pose(scene, ga, pos, quat)
    n_w, depth_c, surf = _point_to_box_lanes(pt, gp_a, gq_a, _t3(scene.geom_size[ga]))
    return surf, (-n_w[0], -n_w[1], -n_w[2]), depth_c


def contacts_lanes(scene, tables, pos, quat, linv, angv, fric_scale, dt_sub):
    """→ (plk_n[b], plk_f[b] Plücker force 3-tuples, net_cf[b], free_cands).

    free_cands: per-candidate geometry for candidates touching a FREE rigid
    body — consumed by the in-kernel Gauss–Seidel impulse sweeps."""
    B = scene.nbody
    tau_c = max(2.0 * dt_sub, 1e-3)
    zeta = 1.0
    geom_used = sorted(
        set(tables.con_geom_a.tolist()) | {g for g in tables.con_geom_b.tolist() if g >= 0}
    )
    gpos: Dict = {}
    gquat: Dict = {}
    seg: Dict = {}
    corners: Dict = {}
    for g in geom_used:
        b = int(scene.geom_body[g])
        off = _t3(scene.geom_pos[g])
        gq = _t4(scene.geom_quat[g])
        gp = L.add3(pos[b], L.qrot(quat[b], off))
        gqq = L.qmul(quat[b], gq)
        gpos[g], gquat[g] = gp, gqq
        gt = int(scene.geom_type[g])
        size = scene.geom_size[g]
        if gt == GEOM_BOX:
            half = _t3(size)
            cs = []
            for sx, sy, sz in _BOX_SAMPLES:      # 26 samples; [:8] = corners
                local = (float(sx) * half[0], float(sy) * half[1], float(sz) * half[2])
                cs.append(L.add3(gp, L.qrot(gqq, local)))
            corners[g] = cs
        else:
            r = float(size[0])
            hl = float(size[1]) if gt == GEOM_CAPSULE else 0.0
            axis = L.qrot(gqq, (0.0, 0.0, 1.0))
            seg[g] = (L.fma3(gp, axis, -hl), L.fma3(gp, axis, hl), r)

    # per-candidate (point, normal, depth) in table order
    cands = []   # (point, normal, depth)
    for which in (0, 1):
        for g in tables.cp_geom.tolist():
            cands.append((None, g, -1, "cp0", (which,)))
    for ci in range(8):
        for g in tables.bp_geom.tolist():
            cands.append((None, g, -1, "bp", (ci,)))
    for ga, gb in zip(tables.cc_a.tolist(), tables.cc_b.tolist()):
        cands.append((None, ga, gb, "cc", ()))
    for which in range(3):
        for ga, gb in zip(tables.cb_cap.tolist(), tables.cb_box.tolist()):
            cands.append((None, ga, gb, "cb", (which,)))
    for ci in range(N_BOX_SAMPLES):
        for ga, gb in zip(tables.bb_a.tolist(), tables.bb_b.tolist()):
            cands.append((None, ga, gb, "bbA", (ci,)))
    for ci in range(N_BOX_SAMPLES):
        for ga, gb in zip(tables.bb_a.tolist(), tables.bb_b.tolist()):
            cands.append((None, ga, gb, "bbB", (ci,)))
    for ci in range(tables.bbc_samples):
        for ga, gb in zip(tables.bbc_a.tolist(), tables.bbc_b.tolist()):
            cands.append((None, ga, gb, "bbc", (ci,)))
    assert len(cands) == tables.n_con, (len(cands), tables.n_con)

    plk_n = [(0.0, 0.0, 0.0)] * B
    plk_f = [(0.0, 0.0, 0.0)] * B
    net_cf = [(0.0, 0.0, 0.0)] * B
    free_cands = []

    for idx, (_, ga, gb, kind, extra) in enumerate(cands):
        if kind == "cp0":
            (which,) = extra
            p0, p1, r = seg[ga]
            pend = p0 if which == 0 else p1
            depth = r - pend[2]
            normal = (0.0, 0.0, 1.0)
            point = (pend[0], pend[1], pend[2] - r)
        elif kind == "bp":
            (ci,) = extra
            pt = corners[ga][ci]
            depth = -pt[2]
            normal = (0.0, 0.0, 1.0)
            point = pt
        elif kind == "cc":
            pa0, pa1, ra = seg[ga]
            pb0, pb1, rb = seg[gb]
            ca, cb = _segment_closest_lanes(pa0, pa1, pb0, pb1)
            delta = L.sub3(ca, cb)
            dist = L.norm3(delta, eps=0.0)
            inv = 1.0 / jnp.maximum(dist, 1e-9)
            normal = L.scale3(delta, inv)
            depth = (ra + rb) - dist
            point = L.fma3(cb, normal, rb - 0.5 * jnp.maximum(depth, 0.0))
        elif kind == "cb":
            (which,) = extra
            p0, p1, r = seg[ga]
            half = _t3(scene.geom_size[gb])
            if which == 0:
                sp = p0
            elif which == 1:
                sp = p1
            else:
                bc = gpos[gb]
                sp, _ = _segment_closest_lanes(p0, p1, bc, bc)
            n_w, depth_c, surf = _point_to_box_lanes(sp, gpos[gb], gquat[gb], half)
            normal, depth, point = n_w, depth_c + r, surf
        elif kind in ("bbA", "bbc"):
            (ci,) = extra
            half = _t3(scene.geom_size[gb])
            n_w, depth_c, surf = _point_to_box_lanes(corners[ga][ci], gpos[gb], gquat[gb], half)
            normal, depth, point = n_w, depth_c, surf
        else:  # bbB
            (ci,) = extra
            half = _t3(scene.geom_size[ga])
            n_w, depth_c, surf = _point_to_box_lanes(corners[gb][ci], gpos[ga], gquat[ga], half)
            normal, depth, point = (-n_w[0], -n_w[1], -n_w[2]), depth_c, surf

        ba = int(scene.geom_body[tables.con_geom_a[idx]])
        gb_idx = int(tables.con_geom_b[idx])
        has_b = gb_idx >= 0
        bb = int(scene.geom_body[gb_idx]) if has_b else -1
        mu0 = float(tables.mu_base[idx])
        fa = fric_scale[int(tables.con_geom_a[idx])]
        fb = fric_scale[gb_idx] if has_b else fa
        mu = mu0 * 0.5 * (fa + fb)

        va = L.add3(linv[ba], L.cross3(angv[ba], L.sub3(point, pos[ba])))
        if has_b:
            vb = L.add3(linv[bb], L.cross3(angv[bb], L.sub3(point, pos[bb])))
            v_rel = L.sub3(va, vb)
        else:
            v_rel = va
        vn = L.dot3(v_rel, normal)
        vt = L.sub3(v_rel, L.scale3(normal, vn))
        vt_norm = L.norm3(vt, eps=0.0)
        active = depth > 0.0
        depth_cl = jnp.minimum(depth, float(scene.max_contact_depth))
        eps_v = float(scene.friction_smoothing_vel)

        def force_with(kn_base):
            kn = kn_base / (tau_c * tau_c)
            kd = 2.0 * zeta * kn_base / tau_c
            fn = jnp.where(active, jnp.maximum(kn * depth_cl - kd * vn, 0.0), 0.0)
            ft_s = -(mu * fn / jnp.maximum(vt_norm, eps_v))
            return L.fma3(L.scale3(normal, fn), vt, ft_s), fn

        # side-asymmetric penalty (see physics/contact.py): free bodies feel
        # the mass-scaled stable stiffness, FIXED bodies the couple stiffness,
        # and the DYNAMIC ARTICULATED side of a couple contact gets NO
        # explicit force — its reaction is applied implicitly inside the
        # articulated velocity solve (dynamics_lanes), exactly as the world
        # engine does (an explicit stiff spring on a gram-scale finger is
        # unconditionally unstable)
        kb = float(tables.kn_base[idx])
        kb_soft = float(tables.kn_base_soft[idx])
        a_is_free = float(tables.a_free[idx]) > 0
        b_is_free = has_b and float(tables.b_free[idx]) > 0
        a_is_art = float(tables.a_art[idx]) > 0
        b_is_art = has_b and float(tables.b_art[idx]) > 0
        a_is_sta = float(tables.a_sta[idx]) > 0
        b_is_sta = has_b and float(tables.b_sta[idx]) > 0
        force_a, fn_a = force_with(kb_soft if a_is_free else kb)
        if has_b:
            if b_is_free == a_is_free:
                force_b, fn_b = force_a, fn_a
            else:
                force_b, fn_b = force_with(kb_soft if b_is_free else kb)
        nO_a = L.cross3(point, force_a)

        if not a_is_art:
            plk_n[ba] = L.add3(plk_n[ba], nO_a)
            plk_f[ba] = L.add3(plk_f[ba], force_a)
            net_cf[ba] = L.add3(net_cf[ba], force_a)
        if has_b and not b_is_art:
            nO_b = L.cross3(point, force_b)
            plk_n[bb] = L.sub3(plk_n[bb], nO_b)
            plk_f[bb] = L.sub3(plk_f[bb], force_b)
            net_cf[bb] = L.sub3(net_cf[bb], force_b)
        if a_is_free or b_is_free or a_is_sta or b_is_sta:
            # geo = this substep's (point, normal, depth), computed ONCE here
            # and reused by every consumer in dynamics_lanes (implicit couple
            # terms, act-count, warm start, GS sweeps, stiction snap — round 1
            # recomputed it up to 6× per substep). 7 live tiles × ~100
            # candidates ≈ 3 MB VMEM through the sweep loop — affordable now
            # that the reduced manifold shrank the candidate set ~2×
            free_cands.append(
                dict(ga=ga, gb=gb, kind=kind, extra=extra, idx=idx,
                     geo=(point, normal, depth),
                     ga_geom=int(tables.con_geom_a[idx]),
                     gb_geom=int(tables.con_geom_b[idx]),
                     kn_stiff=float(tables.kn_base[idx]),
                     mu0=float(tables.mu_base[idx]),
                     ba=ba, bb=bb, has_b=has_b,
                     a_free=a_is_free, b_free=b_is_free,
                     a_art=a_is_art, b_art=b_is_art,
                     a_sta=a_is_sta, b_sta=b_is_sta)
            )
    return plk_n, plk_f, net_cf, free_cands


# ---------------------------------------------------------------------------
# dynamics per actor (mirrors physics/dynamics.py in component form)
# ---------------------------------------------------------------------------

def _crm6(v, m):
    w, vo = v[:3], v[3:]
    cw = L.cross3(w, m[:3])
    cv = L.add3(L.cross3(w, m[3:]), L.cross3(vo, m[:3]))
    return (*cw, *cv)


def _crf6(v, f):
    w, vo = v[:3], v[3:]
    n = L.add3(L.cross3(w, f[:3]), L.cross3(vo, f[3:]))
    ff = L.cross3(w, f[3:])
    return (*n, *ff)


def _spatial_inertia(art_mass, com_w, R, I_com, mscale):
    """6x6 nested-list spatial inertia about the world origin.
    I_com: static 3x3 numpy; mscale: tile; R: nested tuples."""
    m = art_mass * mscale
    # Iw = R I R^T scaled
    RI = [[sum(R[i][k] * float(I_com[k][j]) for k in range(3)) for j in range(3)] for i in range(3)]
    Iw = [[sum(RI[i][k] * R[j][k] for k in range(3)) * mscale for j in range(3)] for i in range(3)]
    cx, cy, cz = com_w
    C = [[0.0, -cz, cy], [cz, 0.0, -cx], [-cy, cx, 0.0]]
    # top-left: Iw + m C C^T ; top-right: m C ; bottom-left: m C^T ; br: m I
    M6 = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            cct = sum(C[i][k] * C[j][k] for k in range(3))
            M6[i][j] = Iw[i][j] + m * cct
            M6[i][3 + j] = m * C[i][j]
            M6[3 + i][j] = m * C[j][i]
            M6[3 + i][3 + j] = m if i == j else 0.0
    return M6


def _mat6vec(M6, v):
    return tuple(sum(M6[i][j] * v[j] for j in range(6)) for i in range(6))


def dynamics_lanes(scene, masks_list, state, pos, quat, linv, angv, axis_w,
                   plk_n, plk_f, mass_scale, dt, free_cands=None,
                   impulse_sweeps=2, fric_scale=None,
                   world_fidelity=False):
    """Implicit velocity update + integration for every dynamic actor.
    masks_list: per-actor ActorMasks (from physics.dynamics.build_actor_masks).
    mass_scale: list of per-body tiles (or floats). Mutates/returns new state dict.

    world_fidelity=True (the fused WORLD step; K=1 so VMEM is plentiful)
    upgrades the impulse sweeps to the world engine's full treatment:
    per-candidate VECTOR tangential impulses with exact cone projection,
    PhysX-style warm starting from state["lam"] (persisting across substeps
    and control steps), and the post-sweep stiction snap — a held grasp drifts
    mm/s off the pads without these (see contact.impulse_contact_pass)."""
    new_state = dict(state)
    deferred = []            # free single-body actors awaiting impulse pass
    new_q = list(state["q"])
    new_qd = list(state["qd"])
    new_rp = list(state["root_pos"])
    new_rq = list(state["root_quat"])
    new_rlv = list(state["root_linvel"])
    new_rav = list(state["root_angvel"])

    # couple contacts (articulated↔free, i.e. grasping): route candidates to
    # their articulated actor. The articulated side got NO explicit penalty in
    # contacts_lanes; it enters the velocity solve IMPLICITLY (Baraff JᵀJ
    # terms) and the GS sweeps TWO-WAY (joint-space effective mass Ψ) —
    # mirroring physics/stacked.py + contact.impulse_contact_pass.
    couple_by_actor: Dict[int, list] = {}
    sta_bodies_by_actor: Dict[int, set] = {}
    if free_cands:
        for c in free_cands:
            if c.get("a_art") or c.get("b_art"):
                art_b = c["ba"] if c["a_art"] else c["bb"]
                aid = int(scene.body_actor[art_b])
                cc = dict(c)
                cc["art_body"] = art_b
                cc["e"] = 1.0 if c["a_art"] else -1.0
                couple_by_actor.setdefault(aid, []).append(cc)
            # art↔static stiction candidates need the actor's Ψ/factor too
            # (friction-only — they add NO implicit normal terms)
            if c.get("a_sta") or c.get("b_sta"):
                art_b = c["ba"] if c["a_sta"] else c["bb"]
                aid = int(scene.body_actor[art_b])
                sta_bodies_by_actor.setdefault(aid, set()).add(art_b)
    # per-actor solve context kept live for the sweeps (factored mass matrix,
    # generalized velocities, subspaces) — integration deferred for these
    art_ctx: Dict[int, dict] = {}
    tau_c_g = max(2.0 * dt, 1e-3)

    for ai, art in enumerate(scene.actors):
        if art.fixed_base and art.ndof == 0:
            continue
        m = masks_list[ai]
        bo = scene.body_offset[ai]
        do = scene.dof_offset[ai]
        base = m.base_dofs
        nv = m.nv
        nb = art.nbody

        # spatial inertias + composite
        Iw = []
        for i in range(nb):
            g = bo + i
            R = L.q_to_R(quat[g])
            com_w = L.add3(pos[g], L.qrot(quat[g], _t3(art.com[i])))
            Iw.append(_spatial_inertia(float(art.mass[i]), com_w, R, art.inertia[i], mass_scale[g]))
        Ic = [[[Iw[i][r][c] for c in range(6)] for r in range(6)] for i in range(nb)]
        for i in range(nb - 1, 0, -1):
            p = int(art.parent[i])
            for r in range(6):
                for c in range(6):
                    Ic[p][r][c] = Ic[p][r][c] + Ic[i][r][c]

        # motion subspaces (world Plücker) per velocity coordinate
        S = [None] * nv
        if base:
            for k in range(6):
                S[k] = tuple(1.0 if i == k else 0.0 for i in range(6))
        for i in range(nb):
            kdof = int(art.dof_index[i])
            if kdof < 0:
                continue
            g = bo + i
            a = axis_w[g]
            if int(art.jtype[i]) == JOINT_REVOLUTE:
                anc = L.cross3(pos[g], a)
                S[base + kdof] = (*a, *anc)
            else:
                S[base + kdof] = (0.0, 0.0, 0.0, *a)

        # body Plücker velocities
        v_b = []
        for i in range(nb):
            g = bo + i
            w = angv[g]
            vo = L.sub3(linv[g], L.cross3(w, pos[g]))
            v_b.append((*w, *vo))

        # generalized velocity
        u = [None] * nv
        if base:
            for k in range(3):
                u[k] = v_b[0][k]
                u[3 + k] = v_b[0][3 + k]
        for i in range(nb):
            kdof = int(art.dof_index[i])
            if kdof >= 0:
                u[base + kdof] = state["qd"][do + kdof]

        # bias forces (RNEA qdd=0, free-fall trick)
        g_lin = (0.0, 0.0, 9.8) if not art.disable_gravity else (0.0, 0.0, 0.0)
        gz = float(-scene.gravity[2])
        g_lin = (0.0, 0.0, gz) if not art.disable_gravity else (0.0, 0.0, 0.0)
        a_sp = [None] * nb
        a_sp[0] = (0.0, 0.0, 0.0, *g_lin)
        for i in range(1, nb):
            p = int(art.parent[i])
            ai_sp = a_sp[p]
            kdof = int(art.dof_index[i])
            if kdof >= 0:
                Sqd = tuple(S[base + kdof][r] * state["qd"][do + kdof] for r in range(6))
                c6 = _crm6(v_b[i], Sqd)
                ai_sp = tuple(ai_sp[r] + c6[r] for r in range(6))
            a_sp[i] = ai_sp
        f_net = []
        for i in range(nb):
            g = bo + i
            Ia = _mat6vec(Iw[i], a_sp[i])
            Iv = _mat6vec(Iw[i], v_b[i])
            cf = _crf6(v_b[i], Iv)
            fx = (*plk_n[g], *plk_f[g])
            f_net.append(tuple(Ia[r] + cf[r] - fx[r] for r in range(6)))
        # subtree sums (reverse accumulate)
        f_sub = [list(f) for f in f_net]
        for i in range(nb - 1, 0, -1):
            p = int(art.parent[i])
            for r in range(6):
                f_sub[p][r] = f_sub[p][r] + f_sub[i][r]
        C = [None] * nv
        for j in range(nv):
            bj = int(m.dof_body[j])
            C[j] = sum(S[j][r] * f_sub[bj][r] for r in range(6))

        # mass matrix entries on ancestor pairs
        F = [None] * nv
        for j in range(nv):
            bj = int(m.dof_body[j])
            F[j] = _mat6vec(Ic[bj], S[j])
        M = [[0.0] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(nv):
                if m.ancestor[i, j]:
                    val = sum(S[i][r] * F[j][r] for r in range(6))
                    M[i][j] = val
                    M[j][i] = val

        # drives (same law as stacked.drive_terms_stacked), incl. the gripper
        # force gate: finger dofs closing against contact stop
        tau = [0.0] * nv
        d_imp = [0.0] * nv
        for kdof in range(art.ndof):
            dglob = do + kdof
            mode = int(art.drive_mode[kdof])
            kp = float(art.drive_kp[kdof])
            kd = float(art.drive_kd[kdof])
            effort = float(art.dof_effort[kdof])
            qk = state["q"][dglob]
            qdk = state["qd"][dglob]
            tgt = state["dof_target"][dglob]
            if "finger" in art.dof_names[kdof] and mode == DRIVE_VELOCITY:
                # velocity-drive fingers only (see stacked.build_stacked's
                # dof_gate_body): `tgt < 0` is velocity-closing semantics;
                # effort-mode fingers must keep their sustained squeeze
                fbody = bo + [i for i in range(art.nbody) if art.dof_index[i] == kdof][0]
                ncf_b = state.get("net_cf", [(0.0, 0.0, 0.0)] * scene.nbody)[fbody]
                fmag = L.norm3(ncf_b, eps=0.0)
                tgt = jnp.where((fmag > float(scene.grip_force_gate)) & (tgt < 0.0), 0.0, tgt)
            if mode == DRIVE_VELOCITY:
                # force-limited implicit drive (see stacked.drive_terms_stacked)
                kd_eff = jnp.minimum(kd, effort / jnp.maximum(jnp.abs(tgt - qdk), 1e-6))
                tk = kd_eff * tgt
                dk = kd_eff
            elif mode == DRIVE_POSITION:
                kp_eff = jnp.minimum(kp, effort / jnp.maximum(jnp.abs(tgt - qk), 1e-6))
                tk = kp_eff * (tgt - qk)
                dk = kp_eff * dt + kd
            elif mode == DRIVE_EFFORT:
                tk = jnp.clip(tgt, -effort, effort)
                dk = kd
            else:
                tk, dk = 0.0, 0.0
            dk = dk + float(art.dof_damping[kdof])
            tk = tk - float(art.dof_friction[kdof]) * jnp.tanh(qdk / 0.02)
            lo = float(art.dof_lower[kdof])
            hi = float(art.dof_upper[kdof])
            below = jnp.maximum(lo - qk, 0.0)
            above = jnp.maximum(qk - hi, 0.0)
            viol = (below > 0) | (above > 0)
            tk = tk + 1.0e3 * (below - above) - jnp.where(viol, 1.0e2 * qdk, 0.0)
            tau[base + kdof] = tk
            d_imp[base + kdof] = dk + float(art.dof_armature[kdof])

        # rhs = M u + dt (tau - C); M_solve = M + diag(dt d_imp + eps)
        rhs = [sum(M[i][j] * u[j] for j in range(nv)) + dt * (tau[i] - C[i]) for i in range(nv)]
        Msolve = [[M[i][j] + ((dt * d_imp[i] + 1e-8) if i == j else 0.0) for j in range(nv)] for i in range(nv)]

        cpl = couple_by_actor.get(ai)
        sta_bodies = sta_bodies_by_actor.get(ai)
        if cpl:
            # implicit couple-contact terms (grasping — see stacked_substep):
            #   M += dt(kd+κ)·JᵀJ,  rhs += dt·Jᵀ(e·kn·d⁺ + (kd+κ)·v_oth_n)
            # with J_j = X·S_j over ancestor coords of the contact link,
            # X = (p×n, n), κ = dt·kn
            for c in cpl:
                pt, n, depth_raw = c["geo"]
                depth_c = jnp.minimum(depth_raw, float(scene.max_contact_depth))
                act = (depth_c > 0.0).astype(jnp.float32)
                lb = c["art_body"] - bo               # local link index
                X6 = (*L.cross3(pt, n), *n)
                Jc = [None] * nv
                sub_coords = [j for j in range(nv) if m.subtree[j, lb]]
                for j in sub_coords:
                    Jc[j] = sum(X6[r] * S[j][r] for r in range(6))
                kn_c = c["kn_stiff"] / (tau_c_g * tau_c_g)
                kd_c = 2.0 * c["kn_stiff"] / tau_c_g
                kap = dt * kn_c
                ob = c["bb"] if c["a_art"] else c["ba"]
                v_oth = L.add3(linv[ob], L.cross3(angv[ob], L.sub3(pt, pos[ob])))
                v_oth_n = L.dot3(v_oth, n)
                coefM = dt * (kd_c + kap) * act
                coefR = dt * (c["e"] * kn_c * jnp.maximum(depth_c, 0.0)
                              + (kd_c + kap) * v_oth_n) * act
                for i in sub_coords:
                    rhs[i] = rhs[i] + coefR * Jc[i]
                    for j in sub_coords:
                        Msolve[i][j] = Msolve[i][j] + coefM * Jc[i] * Jc[j]

        if cpl or sta_bodies:
            L_chol = L.cholesky_factor(Msolve)
            u_new = L.cholesky_solve_factored(L_chol, rhs)
            # joint-space operational inverse inertia Ψ_b = Φ_b M⁻¹ Φ_bᵀ per
            # contact link (consumed by the two-way GS sweeps)
            psi_by_body = {}
            art_bodies = sorted(
                {c["art_body"] for c in (cpl or [])} | (sta_bodies or set())
            )
            for b_g in art_bodies:
                lb = b_g - bo
                sub_coords = [j for j in range(nv) if m.subtree[j, lb]]
                psi = [[0.0] * 6 for _ in range(6)]
                for c6 in range(6):
                    col = [S[j][c6] if j in sub_coords else 0.0 for j in range(nv)]
                    xs = L.cholesky_solve_factored(L_chol, col)
                    for r in range(6):
                        psi[r][c6] = sum(S[j][r] * xs[j] for j in sub_coords)
                psi_by_body[b_g] = psi
            art_ctx[ai] = dict(
                m=m, art=art, bo=bo, do=do, base=base, nv=nv,
                L_chol=L_chol, u_new=u_new, S=S, psi=psi_by_body,
                art_bodies=art_bodies,
            )
            continue  # integration deferred until after the impulse sweeps

        u_new = L.cholesky_solve(Msolve, rhs)

        # integrate (FREE single bodies defer position integration until the
        # impulse sweeps have corrected their velocities)
        if base:
            w_new = (u_new[0], u_new[1], u_new[2])
            v_o = (u_new[3], u_new[4], u_new[5])
            p_r = state["root_pos"][ai]
            v_r = L.add3(v_o, L.cross3(w_new, p_r))
            wcap = float(scene.max_root_angvel)
            vcap = float(scene.max_root_linvel)
            w_new = tuple(jnp.clip(c, -wcap, wcap) for c in w_new)
            v_r = tuple(jnp.clip(c, -vcap, vcap) for c in v_r)
            new_rlv[ai] = v_r
            new_rav[ai] = w_new
            if art.ndof == 0:
                deferred.append(ai)
            else:
                new_rp[ai] = L.fma3(p_r, v_r, dt)
                new_rq[ai] = L.qintegrate(state["root_quat"][ai], w_new, dt)
        for kdof in range(art.ndof):
            dglob = do + kdof
            qd_k = u_new[base + kdof]
            mv = float(art.dof_maxvel[kdof])
            qd_k = jnp.clip(qd_k, -mv, mv)
            qk = state["q"][dglob] + dt * qd_k
            qk = jnp.clip(qk, float(art.dof_lower[kdof]) - 1e-3, float(art.dof_upper[kdof]) + 1e-3)
            new_q[dglob] = qk
            new_qd[dglob] = qd_k

    # ---- Gauss–Seidel impulse sweeps for free rigid bodies (in-kernel
    # analog of contact.impulse_contact_pass; GS converges in ~2 sweeps where
    # Jacobi needs ~16, and sequential updates are free in straight-line code).
    # Articulated couple sides participate TWO-WAY: per-candidate velocity
    # updates through the per-link Ψ, plus an EXACT generalized fold-back
    # ΔU = M⁻¹ΦᵀY at the end of every sweep (the per-link Ψ alone misses the
    # cross-finger coupling that grasp capture depends on).
    if free_cands and impulse_sweeps > 0 and (deferred or art_ctx):
        beta, slop = 0.2, 2e-3
        dcap = float(scene.max_contact_depth)
        tau_c = max(2.0 * dt, 1e-3)
        body2actor = {scene.body_offset[a_]: a_ for a_ in deferred}
        inv_m = {}
        invIw = {}
        for ai2 in deferred:
            b = scene.body_offset[ai2]
            art2 = scene.actors[ai2]
            inv_m[b] = (1.0 / max(float(art2.mass[0]), 1e-6)) / jnp.maximum(mass_scale[b], 1e-6)
            Iinv = np.linalg.inv(art2.inertia[0] + np.eye(3) * 1e-9)
            R = L.q_to_R(state["root_quat"][ai2])
            # R Iinv R^T / scale
            RI = [[sum(R[i][k] * float(Iinv[k][j]) for k in range(3)) for j in range(3)] for i in range(3)]
            invIw[b] = [[sum(RI[i][k] * R[j][k] for k in range(3)) / jnp.maximum(mass_scale[b], 1e-6) for j in range(3)] for i in range(3)]

        body_actor_art = {}
        for aid, ctx in art_ctx.items():
            for b_g in ctx["art_bodies"]:
                body_actor_art[b_g] = aid

        # active-candidate count per articulated ACTOR (contact geometry is
        # constant across sweeps, so count once per substep). The sweeps'
        # per-link Ψ updates make candidates on different links blind to each
        # other within a sweep — Jacobi across legs — and unsplit impulses
        # over-correct the shared floating base into a runaway slide (the
        # same failure the world engine's per-actor n_eff prevents). The
        # art-side effective mass is inflated by this count instead.
        art_act_count: Dict[int, object] = {}
        if body_actor_art:
            for c in free_cands:
                art_side_c = (c.get("a_art") or c.get("b_art")
                              or c.get("a_sta") or c.get("b_sta"))
                if not art_side_c:
                    continue
                b_g = c["ba"] if (c.get("a_art") or c.get("a_sta")) else c["bb"]
                aid = body_actor_art[b_g]
                d_raw = c["geo"][2]
                act_c = (jnp.minimum(d_raw, dcap) > 0.0).astype(jnp.float32)
                art_act_count[aid] = art_act_count.get(aid, 0.0) + act_c
            for aid in list(art_act_count):
                art_act_count[aid] = jnp.maximum(art_act_count[aid], 1.0)

        def _inv_mass_matrix(c):
            """3×3 contact-space inverse-mass matrix K: the effective inverse
            mass along ANY unit direction d is dᵀKd — free sides contribute
            1/m·I₃ + r̃ᵀ(I_w)⁻¹r̃ (r̃ = skew(p−com)), the articulated/static
            side count·GᵀΨG with G = [p̃; I₃]. Geometry, masses and Ψ are all
            fixed within a substep, so K is SWEEP-INVARIANT: computing it once
            here replaces the old per-direction `_eff_inv_mass` recomputation
            (~40-80 tile ops per candidate per sweep) with a 15-op quadratic
            form in the sweep body — exact, not an approximation. (Reusing the
            NORMAL's scalar for the tangent would under-count rotational
            coupling — 200 vs 605 for a pad-held sphere — which is why the
            full matrix is cached, not a scalar.)"""
            pt = c["geo"][0]
            is_sta_c = bool(c.get("a_sta") or c.get("b_sta"))
            is_cpl = (
                bool(c.get("a_art") or c.get("b_art")) or is_sta_c
            ) and TWO_WAY_SWEEPS
            art_is_a = bool(c.get("a_art") or c.get("a_sta"))
            K = [[1e-9 if i == j else 0.0 for j in range(3)] for i in range(3)]
            for b2, fr2 in ((c["ba"], c["a_free"]), (c["bb"], c["b_free"])):
                if not fr2:
                    continue
                r2 = L.sub3(pt, state["root_pos"][body2actor[b2]])
                # skew(r): S[i][j]; columns have 2 nonzeros each
                S = [
                    [0.0, -r2[2], r2[1]],
                    [r2[2], 0.0, -r2[0]],
                    [-r2[1], r2[0], 0.0],
                ]
                Iw2 = invIw[b2]
                # T = I_w⁻¹ · S  (exploit S's zeros)
                T = [
                    [sum(Iw2[i][k2] * S[k2][j] for k2 in range(3) if not isinstance(S[k2][j], float) or S[k2][j] != 0.0)
                     for j in range(3)]
                    for i in range(3)
                ]
                for a in range(3):
                    K[a][a] = K[a][a] + inv_m[b2]
                    for b3 in range(a, 3):
                        K[a][b3] = K[a][b3] + sum(
                            S[i][a] * T[i][b3] for i in range(3)
                            if not isinstance(S[i][a], float) or S[i][a] != 0.0
                        )
            if is_cpl:
                b2 = c["ba"] if art_is_a else c["bb"]
                aid2 = body_actor_art[b2]
                psi2 = art_ctx[aid2]["psi"][b2]
                cnt = art_act_count.get(aid2, 1.0)
                P = [
                    [0.0, -pt[2], pt[1]],
                    [pt[2], 0.0, -pt[0]],
                    [-pt[1], pt[0], 0.0],
                ]
                # V[r][b] = Σ_s Ψ[r][s]·G[s][b],  G = [P; I₃]
                V = [
                    [sum(psi2[r][s] * P[s][b3] for s in range(3)
                         if not isinstance(P[s][b3], float) or P[s][b3] != 0.0)
                     + psi2[r][3 + b3]
                     for b3 in range(3)]
                    for r in range(6)
                ]
                for a in range(3):
                    for b3 in range(a, 3):
                        gpg = sum(
                            P[r][a] * V[r][b3] for r in range(3)
                            if not isinstance(P[r][a], float) or P[r][a] != 0.0
                        ) + V[3 + a][b3]
                        K[a][b3] = K[a][b3] + cnt * gpg
            for a in range(3):          # mirror the upper triangle
                for b3 in range(a + 1, 3):
                    K[b3][a] = K[a][b3]
            # direction-independent floor = what the old per-direction code
            # returned for a DEGENERATE (zero) direction: 1e-9 + Σ free-side
            # 1/m. Real directions are unit vectors, for which dᵀKd ≥ floor
            # automatically (the rotational/Ψ terms are PSD) — the floor only
            # engages on zero normals (e.g. a box contact whose witness point
            # sits exactly on the face-center symmetry plane: sign(0)=0 zeroes
            # the normal), where quad=0 would otherwise divide to ±inf.
            floor = 1e-9
            for b2, fr2 in ((c["ba"], c["a_free"]), (c["bb"], c["b_free"])):
                if fr2:
                    floor = floor + inv_m[b2]
            return K, floor

        def _quad(Kf, d3):
            """max(dᵀKd, floor) for (K, floor) from _inv_mass_matrix."""
            K, floor = Kf
            q = (
                d3[0] * d3[0] * K[0][0]
                + d3[1] * d3[1] * K[1][1]
                + d3[2] * d3[2] * K[2][2]
                + 2.0 * (
                    d3[0] * d3[1] * K[0][1]
                    + d3[0] * d3[2] * K[0][2]
                    + d3[1] * d3[2] * K[1][2]
                )
            )
            return jnp.maximum(q, floor)

        K_cache = [_inv_mass_matrix(c) for c in free_cands]
        k_n_cache = [
            None if (c.get("a_sta") or c.get("b_sta"))
            else _quad(K_cache[ci], c["geo"][1])
            for ci, c in enumerate(free_cands)
        ]

        # ---- rolled sweep loop: the body compiles ONCE (lax.fori_loop) ----
        # An unrolled 8-sweep loop over hundreds of candidates exploded
        # compile time (25 min on the panda_pick scene). The carry packs every
        # sweep-mutable tile: deferred free-actor velocities, per-candidate
        # accumulators, and each couple actor's generalized velocities.
        defer_list = list(deferred)
        couple_aids = sorted(art_ctx)
        n_fc = len(free_cands)
        zero_t = jnp.zeros_like(state["root_pos"][0][0])

        def _tile(x):
            return x + zero_t if isinstance(x, float) else x

        def _pack_carry(rlv, rav, ln, lt, unew):
            # PYTREE carry (round-3 perf): the old packed-rows carry paid a
            # jnp.stack of every row + per-row slicing on EVERY sweep — pure
            # data movement rivaling the sweep math itself. With a pytree of
            # individual tiles the fori_loop carries each buffer by reference
            # and the pack/unpack ops vanish. Floats (never-touched slots) are
            # canonicalized to tiles so the carry structure is iteration-
            # invariant.
            c_rlv = tuple(tuple(_tile(v) for v in rlv[ai2]) for ai2 in defer_list)
            c_rav = tuple(tuple(_tile(v) for v in rav[ai2]) for ai2 in defer_list)
            c_u = tuple(tuple(_tile(v) for v in unew[aid]) for aid in couple_aids)
            c_ln = tuple(_tile(v) for v in ln)
            if world_fidelity:
                c_lt = tuple(tuple(_tile(t3[i]) for i in range(3)) for t3 in lt)
            else:
                c_lt = tuple(_tile(v) for v in lt)
            return (c_rlv, c_rav, c_u, c_ln, c_lt)

        def _unpack_carry(carry):
            c_rlv, c_rav, c_u, c_ln, c_lt = carry
            rlv = {ai2: c_rlv[k] for k, ai2 in enumerate(defer_list)}
            rav = {ai2: c_rav[k] for k, ai2 in enumerate(defer_list)}
            unew = {aid: list(c_u[k]) for k, aid in enumerate(couple_aids)}
            ln = list(c_ln)
            lt = [tuple(t3) for t3 in c_lt] if world_fidelity else list(c_lt)
            return rlv, rav, ln, lt, unew

        def _sweep_body(_, carry):
            new_rlv, new_rav, lam_n, lam_t_acc, unew_by = _unpack_carry(carry)
            # live post-solve spatial velocities (ω, v_O) of articulated
            # contact links, refreshed from the carried u at sweep start
            v6_art: Dict[int, list] = {}
            for aid in couple_aids:
                ctx = art_ctx[aid]
                S_l, m_l, bo_l = ctx["S"], ctx["m"], ctx["bo"]
                u_l = unew_by[aid]
                for b_g in ctx["art_bodies"]:
                    lb = b_g - bo_l
                    v6 = [0.0] * 6
                    for j in range(ctx["nv"]):
                        if m_l.subtree[j, lb]:
                            for r in range(6):
                                v6[r] = v6[r] + S_l[j][r] * u_l[j]
                    v6_art[b_g] = v6
            Y_body = {b_g: [0.0] * 6 for b_g in body_actor_art}

            def body_vel_at(b, point):
                if b in body2actor:
                    ai2 = body2actor[b]
                    return L.add3(new_rlv[ai2], L.cross3(new_rav[ai2], L.sub3(point, state["root_pos"][ai2])))
                if b in v6_art:
                    v6 = v6_art[b]
                    return L.add3((v6[3], v6[4], v6[5]), L.cross3((v6[0], v6[1], v6[2]), point))
                return L.add3(linv[b], L.cross3(angv[b], L.sub3(point, pos[b])))

            for ci, c in enumerate(free_cands):
                pt, n, depth_raw = c["geo"]
                depth = jnp.minimum(depth_raw, dcap)
                active = depth > 0.0
                target = jnp.minimum(beta * jnp.maximum(depth - slop, 0.0) / dt, 0.5)
                va = body_vel_at(c["ba"], pt)
                vb = body_vel_at(c["bb"], pt) if c["has_b"] else (0.0, 0.0, 0.0)
                v_rel = L.sub3(va, vb)
                vn = L.dot3(v_rel, n)
                is_sta_c = bool(c.get("a_sta") or c.get("b_sta"))
                is_cpl = (
                    bool(c.get("a_art") or c.get("b_art")) or is_sta_c
                ) and TWO_WAY_SWEEPS
                art_is_a = bool(c.get("a_art") or c.get("a_sta"))

                if is_sta_c:
                    # art↔static: FRICTION-ONLY (normal carried by the stiff
                    # penalty — an impulse on top would double the support)
                    imp = (0.0, 0.0, 0.0)
                else:
                    k_n = k_n_cache[ci]
                    d_lam = jnp.where(active, -(vn - target) / k_n, 0.0)
                    new_lam = jnp.maximum(lam_n[ci] + d_lam, 0.0)
                    d_imp = new_lam - lam_n[ci]
                    lam_n[ci] = new_lam
                    imp = L.scale3(n, d_imp)
                # friction (cone-projected accumulated tangential impulse)
                vt = L.sub3(v_rel, L.scale3(n, vn))
                vt_n = L.norm3(vt, eps=1e-9)
                t_dir = L.scale3(vt, 1.0 / vt_n)
                k_t = _quad(K_cache[ci], t_dir)
                jt_try = tuple(jnp.where(active, -vt[i] / k_t, 0.0) for i in range(3))
                jt_norm = L.norm3(jt_try, eps=0.0)
                # friction cone: couple candidates are seeded with the
                # IMPLICIT contact's normal force (fn = kn·d − (kd+κ)·vn, the
                # same law the velocity solve applied — matches the world
                # engine's fn_star seeding)
                if is_sta_c:
                    # cone seed = the stiff penalty's normal force on the
                    # articulated side (the law contacts_lanes applied)
                    kn_c = c["kn_stiff"] / (tau_c * tau_c)
                    kd_c = 2.0 * c["kn_stiff"] / tau_c
                    fn_seed = jnp.maximum(
                        kn_c * jnp.maximum(depth, 0.0) - kd_c * vn, 0.0
                    )
                elif is_cpl:
                    kn_c = c["kn_stiff"] / (tau_c * tau_c)
                    kd_c = 2.0 * c["kn_stiff"] / tau_c
                    fn_seed = jnp.maximum(
                        kn_c * jnp.maximum(depth, 0.0) - (kd_c + dt * kn_c) * vn, 0.0
                    )
                elif c["has_b"] and (c["a_free"] != c["b_free"]):
                    fn_seed = (c["kn_stiff"] / (tau_c * tau_c)) * jnp.maximum(depth, 0.0)
                else:
                    fn_seed = 0.0
                fa_ = fric_scale[c["ga_geom"]] if fric_scale is not None else 1.0
                fb_ = (fric_scale[c["gb_geom"]] if c["has_b"] else fa_) if fric_scale is not None else 1.0
                mu_c = c["mu0"] * 0.5 * (fa_ + fb_)
                cap = mu_c * (lam_n[ci] + fn_seed * dt)
                if world_fidelity:
                    # exact vector cone projection on the ACCUMULATED
                    # tangential impulse (identical to the world engine's
                    # impulse_contact_pass — stiction must converge tightly
                    # or a grasped object drifts through the pads)
                    lam_t_new = L.add3(lam_t_acc[ci], jt_try)
                    ltn = L.norm3(lam_t_new, eps=1e-9)
                    sc = jnp.minimum(1.0, cap / ltn)
                    lam_t_proj = L.scale3(lam_t_new, sc)
                    jt = L.sub3(lam_t_proj, lam_t_acc[ci])
                    lam_t_acc[ci] = lam_t_proj
                else:
                    cap_left = jnp.maximum(cap - lam_t_acc[ci], 0.0)
                    sc = jnp.minimum(1.0, cap_left / jnp.maximum(jt_norm, 1e-9))
                    jt = L.scale3(jt_try, sc)
                    lam_t_acc[ci] = lam_t_acc[ci] + jt_norm * sc
                imp = L.add3(imp, jt)
                if DEBUG_SWEEPS:
                    print(
                        f"  cand {ci} {c['kind']}{c['extra']} ga{c['ga']} gb{c['gb']} "
                        f"d={float(depth[0,0]):+.4f} vn={float(vn[0,0]):+.3f} "
                        f"k_n={float(k_n[0,0]) if hasattr(k_n,'shape') else k_n:.1f} "
                        f"dlam={float(d_imp[0,0]):+.5f} "
                        f"jt=({float(jt[0][0,0]):+.5f},{float(jt[1][0,0]):+.5f},{float(jt[2][0,0]):+.5f}) "
                        f"cap={float(cap[0,0]):.4f}"
                    )
                for b, fr, sgn in ((c["ba"], c["a_free"], 1.0), (c["bb"], c["b_free"], -1.0)):
                    if not fr:
                        continue
                    ai2 = body2actor[b]
                    si = L.scale3(imp, sgn)
                    new_rlv[ai2] = L.fma3(new_rlv[ai2], si, inv_m[b])
                    r = L.sub3(pt, state["root_pos"][ai2])
                    tor = L.cross3(r, si)
                    dang = tuple(sum(invIw[b][i][j] * tor[j] for j in range(3)) for i in range(3))
                    new_rav[ai2] = L.add3(new_rav[ai2], dang)
                if is_cpl:
                    # articulated reaction: spatial impulse about the origin
                    b_g = c["ba"] if art_is_a else c["bb"]
                    si = L.scale3(imp, 1.0 if art_is_a else -1.0)
                    Yc = (*L.cross3(pt, si), *si)
                    Yb = Y_body[b_g]
                    for r in range(6):
                        Yb[r] = Yb[r] + Yc[r]
                    # immediate per-link velocity update (GS freshness)
                    psi = art_ctx[body_actor_art[b_g]]["psi"][b_g]
                    dV = [sum(psi[r][cc_] * Yc[cc_] for cc_ in range(6)) for r in range(6)]
                    v6 = v6_art[b_g]
                    v6_art[b_g] = [v6[r] + dV[r] for r in range(6)]
            # exact generalized fold-back per couple actor: u += M⁻¹ΦᵀY
            for aid in couple_aids:
                ctx = art_ctx[aid]
                S_l, m_l, bo_l, nv_l = ctx["S"], ctx["m"], ctx["bo"], ctx["nv"]
                rhsY = [0.0] * nv_l
                for b_g in ctx["art_bodies"]:
                    lb = b_g - bo_l
                    Yb = Y_body[b_g]
                    for j in range(nv_l):
                        if m_l.subtree[j, lb]:
                            rhsY[j] = rhsY[j] + sum(S_l[j][r] * Yb[r] for r in range(6))
                dU = L.cholesky_solve_factored(ctx["L_chol"], rhsY)
                unew_by[aid] = [unew_by[aid][j] + dU[j] for j in range(nv_l)]
            return _pack_carry(new_rlv, new_rav, lam_n, lam_t_acc, unew_by)

        # per-candidate accumulators persisting across sweeps: the normal
        # impulse λ_n (≥ 0 projection) and the tangential impulse — a vector
        # with exact cone projection in world_fidelity mode, a scalar
        # magnitude bound otherwise (without either, each sweep re-applies
        # friction up to the full cone and total friction can reach sweeps×
        # the cone in sliding regimes).
        lam0_n = [0.0] * n_fc
        lam0_t = [(0.0, 0.0, 0.0) if world_fidelity else 0.0] * n_fc
        lam_warm = state.get("lam") if world_fidelity else None
        if lam_warm is not None:
            # PhysX-style persistent-contact warm start: re-apply last
            # substep's converged impulses on currently-active candidates,
            # then let the sweeps correct the (small) error. Candidates are a
            # static table, so row ci is always the same pair.
            Yw_body = {b_g: [0.0] * 6 for b_g in body_actor_art}
            for ci, c in enumerate(free_cands):
                pt, n, depth_raw = c["geo"]
                act = (jnp.minimum(depth_raw, dcap) > 0.0).astype(jnp.float32)
                lnw = lam_warm[ci][0] * act
                ltw = tuple(lam_warm[ci][1 + i] * act for i in range(3))
                lam0_n[ci] = lnw
                lam0_t[ci] = ltw
                imp = L.add3(L.scale3(n, lnw), ltw)
                for b, fr, sgn in ((c["ba"], c["a_free"], 1.0), (c["bb"], c["b_free"], -1.0)):
                    if not fr:
                        continue
                    ai2 = body2actor[b]
                    si = L.scale3(imp, sgn)
                    new_rlv[ai2] = L.fma3(new_rlv[ai2], si, inv_m[b])
                    r = L.sub3(pt, state["root_pos"][ai2])
                    tor = L.cross3(r, si)
                    dang = tuple(sum(invIw[b][i][j] * tor[j] for j in range(3)) for i in range(3))
                    new_rav[ai2] = L.add3(new_rav[ai2], dang)
                if c.get("a_art") or c.get("b_art") or c.get("a_sta") or c.get("b_sta"):
                    art_a_ = bool(c.get("a_art") or c.get("a_sta"))
                    b_g = c["ba"] if art_a_ else c["bb"]
                    si = L.scale3(imp, 1.0 if art_a_ else -1.0)
                    Yc = (*L.cross3(pt, si), *si)
                    Yb = Yw_body[b_g]
                    for r in range(6):
                        Yb[r] = Yb[r] + Yc[r]
            # exact generalized response of the warm impulses on the arms
            for aid in couple_aids:
                ctx = art_ctx[aid]
                S_l, m_l, bo_l, nv_l = ctx["S"], ctx["m"], ctx["bo"], ctx["nv"]
                rhsY = [0.0] * nv_l
                for b_g in ctx["art_bodies"]:
                    lb = b_g - bo_l
                    Yb = Yw_body[b_g]
                    for j in range(nv_l):
                        if m_l.subtree[j, lb]:
                            rhsY[j] = rhsY[j] + sum(S_l[j][r] * Yb[r] for r in range(6))
                dU = L.cholesky_solve_factored(ctx["L_chol"], rhsY)
                ctx["u_new"] = [ctx["u_new"][j] + dU[j] for j in range(nv_l)]

        carry0 = _pack_carry(
            {ai2: new_rlv[ai2] for ai2 in defer_list},
            {ai2: new_rav[ai2] for ai2 in defer_list},
            lam0_n, lam0_t,
            {aid: art_ctx[aid]["u_new"] for aid in couple_aids},
        )
        if DEBUG_SWEEPS:
            carry = carry0
            for s_ in range(impulse_sweeps):   # eager, printable
                carry = _sweep_body(s_, carry)
        else:
            carry = jax.lax.fori_loop(0, impulse_sweeps, _sweep_body, carry0)
        rlv_f, rav_f, lamf_n, lamf_t, unew_f = _unpack_carry(carry)
        for ai2 in defer_list:
            new_rlv[ai2] = rlv_f[ai2]
            new_rav[ai2] = rav_f[ai2]
        for aid in couple_aids:
            art_ctx[aid]["u_new"] = unew_f[aid]
        if world_fidelity:
            new_state["lam"] = [
                (lamf_n[ci], lamf_t[ci][0], lamf_t[ci][1], lamf_t[ci][2])
                for ci in range(n_fc)
            ]

        if world_fidelity and body_actor_art:
            # ---- stiction snap (couple contacts; see contact.impulse_
            # contact_pass): finish convergence with one direct 6×6 LS per
            # free body matching its rigid motion to the articulated side at
            # all sticking couple points. Clamped to 5 cm/s — it may only
            # finish convergence, never act as an energy-injecting constraint.
            v6f: Dict[int, list] = {}
            for aid in couple_aids:
                ctx = art_ctx[aid]
                S_l, m_l, bo_l = ctx["S"], ctx["m"], ctx["bo"]
                u_l = ctx["u_new"]
                for b_g in ctx["art_bodies"]:
                    lb = b_g - bo_l
                    v6 = [0.0] * 6
                    for j in range(ctx["nv"]):
                        if m_l.subtree[j, lb]:
                            for r in range(6):
                                v6[r] = v6[r] + S_l[j][r] * u_l[j]
                    v6f[b_g] = v6
            A_by: Dict[int, list] = {}
            b_by: Dict[int, list] = {}
            for ci, c in enumerate(free_cands):
                if not (c.get("a_art") or c.get("b_art")):
                    continue
                pt, n, depth_raw = c["geo"]
                depth = jnp.minimum(depth_raw, dcap)
                act = (depth > 0.0).astype(jnp.float32)
                b_art_g = c["ba"] if c["a_art"] else c["bb"]
                b_free_g = c["bb"] if c["a_art"] else c["ba"]
                e_snap = -1.0 if c["a_art"] else 1.0   # +1 when the FREE body is side a
                ai2 = body2actor[b_free_g]
                v_free = L.add3(new_rlv[ai2], L.cross3(new_rav[ai2], L.sub3(pt, state["root_pos"][ai2])))
                v6 = v6f[b_art_g]
                v_art = L.add3((v6[3], v6[4], v6[5]), L.cross3((v6[0], v6[1], v6[2]), pt))
                # v_rel in candidate (a−b) order
                v_rel = L.sub3(v_art, v_free) if c["a_art"] else L.sub3(v_free, v_art)
                # sticking: strictly inside the cone
                vn_f = L.dot3(v_rel, n)
                kn_c = c["kn_stiff"] / (tau_c * tau_c)
                kd_c = 2.0 * c["kn_stiff"] / tau_c
                fn_imp = jnp.maximum(
                    kn_c * jnp.maximum(depth, 0.0) - (kd_c + dt * kn_c) * vn_f, 0.0
                )
                fa_ = fric_scale[c["ga_geom"]] if fric_scale is not None else 1.0
                fb_ = (fric_scale[c["gb_geom"]] if c["has_b"] else fa_) if fric_scale is not None else 1.0
                mu_c = c["mu0"] * 0.5 * (fa_ + fb_)
                cap_f = mu_c * (lamf_n[ci] + fn_imp * dt)
                lt_n = L.norm3(lamf_t[ci], eps=0.0)
                w_st = act * (lt_n < 0.98 * cap_f).astype(jnp.float32)
                r_free = L.sub3(pt, state["root_pos"][ai2])
                # X (3,6): point-velocity map of the free body, ξ=(Δω, Δv)
                # rows: v_pt = Δv + Δω×r → X = [−skew(r) | I]
                sk = (
                    (0.0, r_free[2], -r_free[1]),
                    (-r_free[2], 0.0, r_free[0]),
                    (r_free[1], -r_free[0], 0.0),
                )   # = −skew(r)
                P = [[(1.0 if i == j else 0.0) - n[i] * n[j] for j in range(3)] for i in range(3)]
                X = [[sk[i][0], sk[i][1], sk[i][2], 1.0 if i == 0 else 0.0,
                      1.0 if i == 1 else 0.0, 1.0 if i == 2 else 0.0] for i in range(3)]
                if b_free_g not in A_by:
                    A_by[b_free_g] = [[0.0] * 6 for _ in range(6)]
                    b_by[b_free_g] = [0.0] * 6
                PX = [[sum(P[i][k2] * X[k2][j] for k2 in range(3)) for j in range(6)] for i in range(3)]
                Pv = [sum(P[i][k2] * (e_snap * v_rel[k2]) for k2 in range(3)) for i in range(3)]
                A_c = A_by[b_free_g]
                b_c = b_by[b_free_g]
                for i in range(6):
                    b_c[i] = b_c[i] - w_st * sum(X[k2][i] * Pv[k2] for k2 in range(3))
                    for j in range(6):
                        A_c[i][j] = A_c[i][j] + w_st * sum(X[k2][i] * PX[k2][j] for k2 in range(3))
            for b_free_g, A_c in A_by.items():
                ai2 = body2actor[b_free_g]
                A_reg = [[A_c[i][j] + (1e-4 if i == j else 0.0) for j in range(6)] for i in range(6)]
                xi = L.cholesky_solve(A_reg, b_by[b_free_g])
                xi = [jnp.clip(x, -0.05, 0.05) for x in xi]
                new_rav[ai2] = L.add3(new_rav[ai2], (xi[0], xi[1], xi[2]))
                new_rlv[ai2] = L.add3(new_rlv[ai2], (xi[3], xi[4], xi[5]))

    # deferred articulated integration (couple actors) with impulse-corrected
    # generalized velocities
    for aid, ctx in art_ctx.items():
        art, m, bo, do = ctx["art"], ctx["m"], ctx["bo"], ctx["do"]
        base, u_new = ctx["base"], ctx["u_new"]
        if base:
            w_new = (u_new[0], u_new[1], u_new[2])
            v_o = (u_new[3], u_new[4], u_new[5])
            p_r = state["root_pos"][aid]
            v_r = L.add3(v_o, L.cross3(w_new, p_r))
            wcap = float(scene.max_root_angvel)
            vcap = float(scene.max_root_linvel)
            w_new = tuple(jnp.clip(cc_, -wcap, wcap) for cc_ in w_new)
            v_r = tuple(jnp.clip(cc_, -vcap, vcap) for cc_ in v_r)
            new_rlv[aid] = v_r
            new_rav[aid] = w_new
            new_rp[aid] = L.fma3(p_r, v_r, dt)
            new_rq[aid] = L.qintegrate(state["root_quat"][aid], w_new, dt)
        for kdof in range(art.ndof):
            dglob = do + kdof
            qd_k = u_new[ctx["base"] + kdof]
            mv = float(art.dof_maxvel[kdof])
            qd_k = jnp.clip(qd_k, -mv, mv)
            qk = state["q"][dglob] + dt * qd_k
            qk = jnp.clip(qk, float(art.dof_lower[kdof]) - 1e-3, float(art.dof_upper[kdof]) + 1e-3)
            new_q[dglob] = qk
            new_qd[dglob] = qd_k

    # deferred free-body position integration with corrected velocities
    for ai2 in deferred:
        p_r = state["root_pos"][ai2]
        new_rp[ai2] = L.fma3(p_r, new_rlv[ai2], dt)
        new_rq[ai2] = L.qintegrate(state["root_quat"][ai2], new_rav[ai2], dt)

    new_state["q"] = new_q
    new_state["qd"] = new_qd
    new_state["root_pos"] = new_rp
    new_state["root_quat"] = new_rq
    new_state["root_linvel"] = new_rlv
    new_state["root_angvel"] = new_rav
    return new_state


def substep_lanes(scene, tables, masks_list, state, fric_scale, mass_scale, dt,
                  impulse_sweeps=2, world_fidelity=False,
                  skip_contacts=False, skip_dynamics=False):
    """One full substep; returns (new_state, LaneView of the pre-integration
    snapshot with contact forces — used by cost terms after the last substep).

    skip_contacts / skip_dynamics: PROFILING ablations only (scripts/
    profile_kernel.py) — they produce physically wrong states but isolate the
    per-phase VPU cost of the narrowphase+penalty section and the articulated
    solve + GS sweeps."""
    B = scene.nbody
    pos, quat, linv, angv, axis_w = fk_lanes(scene, state)
    if skip_contacts:
        zero3 = (0.0, 0.0, 0.0)
        plk_n, plk_f, net_cf, free_cands = (
            [zero3] * B, [zero3] * B, [zero3] * B, [],
        )
    else:
        plk_n, plk_f, net_cf, free_cands = contacts_lanes(
            scene, tables, pos, quat, linv, angv, fric_scale, dt
        )
    if skip_dynamics:
        # ballistic integrate of free roots only — isolates FK+contacts cost
        new_state = dict(state)
        new_state["root_pos"] = [
            L.fma3(state["root_pos"][a], state["root_linvel"][a], dt)
            for a in range(scene.nactor)
        ]
    else:
        new_state = dynamics_lanes(
            scene, masks_list, state, pos, quat, linv, angv, axis_w,
            plk_n, plk_f, mass_scale, dt,
            # candidates always flow: couple contacts are solved IMPLICITLY in
            # the velocity solve even in penalty-only mode (impulse_sweeps=0
            # only disables the GS sweeps)
            free_cands=free_cands,
            impulse_sweeps=impulse_sweeps, fric_scale=fric_scale,
            world_fidelity=world_fidelity,
        )
    new_state["net_cf"] = net_cf
    return new_state


def free_cand_indices(scene, tables) -> np.ndarray:
    """Contact-table indices of the impulse-pass candidates, in the order
    contacts_lanes enumerates them (ascending table order). The fused world
    step uses this to map its persistent-λ rows onto SimState.contact_lam —
    sharing the warm-start cache with the XLA engine's impulse pass."""
    from ...physics.contact import _free_body_mask

    free = _free_body_mask(scene)
    ga = tables.con_geom_a
    gb = tables.con_geom_b
    out = []
    for idx in range(tables.n_con):
        a_is_free = free[scene.geom_body[ga[idx]]] > 0
        b_is_free = gb[idx] >= 0 and free[scene.geom_body[gb[idx]]] > 0
        is_sta = tables.a_sta[idx] > 0 or tables.b_sta[idx] > 0
        if a_is_free or b_is_free or is_sta:
            out.append(idx)
    return np.asarray(out, np.int64)


def n_free_cands(scene, tables) -> int:
    return len(free_cand_indices(scene, tables))


def view_of(scene, state):
    """LaneView of a state dict (recomputes FK for fresh body poses)."""
    pos, quat, linv, angv, _ = fk_lanes(scene, state)
    return LaneView(
        scene, pos, quat, linv, angv,
        state.get("net_cf", [(0.0, 0.0, 0.0)] * scene.nbody),
        state["q"], state["qd"],
        state["root_pos"], state["root_quat"], state["root_linvel"],
    )
