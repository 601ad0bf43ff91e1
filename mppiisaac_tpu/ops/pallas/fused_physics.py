"""The physics substep in component ("lanes") form for the fused Pallas kernel.

Semantically IDENTICAL to the XLA engine (physics/stacked.py + contact.py):
same FK, same world-frame Plücker CRBA/RNEA, same implicit drives, same
compliant contact law, same mass-splitting Jacobi impulse pass, same
integrator — unit tests compare the two paths state-for-state. The difference
is purely representational: every scalar is an (8,128) tile of MPPI samples.

Round-4 restructure — PAIR-BLOCK BATCHING: the contact sections (narrowphase,
penalty forces, implicit couple terms, impulse sweeps, stiction snap) used to
be fully unrolled per CANDIDATE (~90-130 straight-line tile-ops × ~90-240
candidates per substep). They are now batched per (kind, geom-pair) BLOCK: the
S manifold samples of one pair ride a leading axis, so each block lowers to
~50-100 vector ops on (S,8,128) arrays instead of S×that many scalar-tile ops.
This cut the kernel's instruction count ~8-10×, which attacks both measured
bottlenecks of the r3 profile (GS sweeps + narrowphase = 75% of kernel time;
VPU instruction-issue bound) and the Mosaic compile blowup (864 s cold for the
unrolled kernel).

The impulse sweeps simultaneously switched from per-candidate Gauss–Seidel to
the XLA engine's exact algorithm — mass-splitting Jacobi with per-body /
per-actor active-contact counts and relax=0.9 (contact.impulse_contact_pass)
— so the fused and XLA contact paths now share one convergence behavior.

State layout (python dict of tiles / tuples of tiles):
  root_pos[a], root_quat[a], root_linvel[a], root_angvel[a]  per actor
  q[d], qd[d]                                                per actuated dof
  lam (world fidelity): per swept block (lam_n (S,8,128), lam_t 3×(S,8,128))
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
from ...physics.stacked import DAMP_CAP_BETA as _DAMP_BETA
from ...physics.urdf import GEOM_BOX, GEOM_CAPSULE
from . import lanes as L

# debug toggle: disable the articulated side of the sweeps (implicit couple
# solve stays on) — lets tests bisect two-way-sweep regressions
TWO_WAY_SWEEPS = True

# Round-4 perf lever (PROFILE.md "broadphase candidate pruning"): skip a pair
# block's ENTIRE contact pipeline (narrowphase, penalty, couple terms, impulse
# sweeps, λ carry, stiction rows) behind one scalar `lax.cond` when the two
# geoms' bounding spheres are separated across ALL samples in the tile. The
# gate is exact: separated bounds ⇒ depth < 0 for every manifold sample ⇒ the
# ungated code produces exactly-zero contributions (penalty force, act mask,
# impulses, λ) — so gating changes no numerics, only skips dead work. Most of
# a scene's blocks (arm links vs table, block vs far obstacles) are separated
# in every lane most of the time; MPPI samples branch from ONE world state, so
# tiles are near-uniform and the scalar cond usually takes the cheap path.
BROADPHASE_GATE = True


def _geom_bound(scene, g) -> float:
    """Host-side bounding-sphere radius of geom g about its BODY origin."""
    gt = int(scene.geom_type[g])
    s = np.asarray(scene.geom_size[g], np.float32)
    off = float(np.linalg.norm(np.asarray(scene.geom_pos[g], np.float32)))
    if gt == GEOM_BOX:
        r = float(np.linalg.norm(s[:3]))
    elif gt == GEOM_CAPSULE:
        r = float(s[0]) + float(s[1])
    else:
        r = float(s[0])
    return off + r


def block_gate(scene, blk, pos, quat=None, margin=1e-3):
    """Scalar "possibly in contact" predicate for one pair block: any-lane
    bounding-sphere overlap on the bodies' origins (plane blocks: height test
    against z=0). False ⇒ every sample of the block is separated ⇒ the block
    contributes exactly zero everywhere and may be skipped whole."""
    ra = _geom_bound(scene, blk["ga_geom"])
    ca = pos[blk["ba"]]
    # NaN-safe: a diverged sample must keep the contact pipeline LIVE (the
    # ungated code propagates NaN through the contact math); `any(x <= thr)`
    # is False for all-NaN, so write the predicate as ~all(separated) —
    # NaN comparisons make `separated` False, keeping the block on.
    if not blk["has_b"]:
        return ~jnp.all(ca[2] > ra + margin)
    gb = blk["gb_geom"]
    if quat is not None and int(scene.geom_type[gb]) == GEOM_BOX \
            and np.allclose(np.asarray(scene.geom_quat[gb]), [0, 0, 0, 1], atol=1e-6):
        # b-side box: EXACT point-to-box slab distance instead of a bounding
        # sphere. Matters for big boxes: the pick table's bounding radius is
        # ~0.67 m, so the sphere test kept every arm↔table block live even
        # with the arm high above the table — 45% of the scene's penalty
        # candidates (r5 census). Conservative/exact: all of A's geometry
        # lies within ra of A's origin, so dist(origin_a, box_b) > ra+margin
        # ⇒ no sample of either direction can touch. d is rotated into the
        # box frame with the b body's (traced) quat — valid for rotated and
        # moving boxes alike.
        half = np.asarray(scene.geom_size[gb], np.float32)
        db = L.qrot_inv(quat[blk["bb"]], L.sub3(ca, pos[blk["bb"]]))
        off = np.asarray(scene.geom_pos[gb], np.float32)
        e = [jnp.maximum(jnp.abs(db[i] - float(off[i])) - float(half[i]), 0.0)
             for i in range(3)]
        d2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
        thr = ra + margin
        return ~jnp.all(d2 > thr * thr)
    rb = _geom_bound(scene, gb)
    d = L.sub3(ca, pos[blk["bb"]])
    thr = ra + rb + margin
    return ~jnp.all(L.dot3(d, d) > thr * thr)


def _gcond(gate, fn):
    """lax.cond(gate, fn, zeros-like); gate None ⇒ call fn directly. fn takes
    no args (closure) and returns a pytree of arrays/scalars."""
    if gate is None:
        return fn()
    shapes = jax.eval_shape(fn)
    return jax.lax.cond(
        gate, fn,
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes),
    )


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
# contacts: static pair-block plan + batched narrowphase
# (mirrors physics/contact.py candidate enumeration + force law)
# ---------------------------------------------------------------------------

def _point_to_box_lanes(point, box_pos, box_quat, half):
    """Mirror of contact._point_to_box in component form. Shape-agnostic:
    `point` components may carry a leading sample axis (S,8,128); the box pose
    tiles broadcast."""
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


from ...physics.contact import _BOX_SAMPLES, N_BOX_SAMPLES  # noqa: E402


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


def build_pair_blocks(scene, tables):
    """Static contact plan: one block per (kind, geom-pair), each covering the
    S manifold samples of that pair. Table row indices per block follow the
    flat candidate order of physics/contact.py (sample-major within kinds), so
    kn/mu/flags can be read off the flat tables — they are constant within a
    block by construction (same pair → same bodies/materials).

    Returns (blocks, sconst): box-sample local offsets are per-SAMPLE constant
    vectors, which Pallas kernels cannot capture as array constants — they are
    packed into one flat f32 table `sconst` (per block: [x·S, y·S, z·S] at
    blk["sc_off"]) that the kernel receives broadcast to (SC, 8, 128) and
    slices per block."""
    blocks: List[dict] = []
    sconst: List[float] = []
    o = 0
    ncp = len(tables.cp_geom)
    nbp = len(tables.bp_geom)
    ncc = len(tables.cc_a)
    ncb = len(tables.cb_cap)
    nbb = len(tables.bb_a)
    nbbc = len(tables.bbc_a)

    def add(kind, ga, gb, S, rows):
        rows = np.asarray(rows, np.int64)
        r0 = int(rows[0])
        assert np.allclose(tables.kn_base[rows], tables.kn_base[r0])
        assert np.allclose(tables.mu_base[rows], tables.mu_base[r0])
        ga_geom = int(tables.con_geom_a[r0])
        gb_geom = int(tables.con_geom_b[r0])
        has_b = gb_geom >= 0
        ba = int(scene.geom_body[ga_geom])
        bb = int(scene.geom_body[gb_geom]) if has_b else -1
        blk = dict(
            kind=kind, ga=int(ga), gb=int(gb), S=int(S), rows=rows,
            ga_geom=ga_geom, gb_geom=gb_geom, ba=ba, bb=bb, has_b=has_b,
            kn=float(tables.kn_base[r0]),
            kn_soft=float(tables.kn_base_soft[r0]),
            mu0=float(tables.mu_base[r0]),
            a_free=bool(tables.a_free[r0] > 0),
            b_free=bool(has_b and tables.b_free[r0] > 0),
            a_art=bool(tables.a_art[r0] > 0),
            b_art=bool(has_b and tables.b_art[r0] > 0),
            a_sta=bool(tables.a_sta[r0] > 0),
            b_sta=bool(has_b and tables.b_sta[r0] > 0),
            npts=float(tables.n_pts[r0]) if len(tables.n_pts) else 4.0,
        )
        blk["swept"] = blk["a_free"] or blk["b_free"] or blk["a_sta"] or blk["b_sta"]
        # STATIC (fixed, non-articulated) side flags — its net_cf REPORT for
        # a free partner mirrors the free side's soft force (see
        # physics/contact.py net_cf: the stiff bookkeeping spring is never
        # physically applied, and its ~100 N transients through objectives'
        # collision terms vetoed sampled grasps — r5 omni root cause)
        from ...physics.contact import _articulated_body_mask, _free_body_mask

        free_np = _free_body_mask(scene)
        art_np = _articulated_body_mask(scene)
        blk["a_static"] = bool(free_np[ba] == 0 and art_np[ba] == 0)
        blk["b_static"] = bool(has_b and free_np[bb] == 0 and art_np[bb] == 0)
        # free-side body mass for couple blocks — the damper cap scale (see
        # physics/stacked.py DAMP_CAP_BETA)
        if blk["a_art"] or blk["b_art"]:
            ob = bb if blk["a_art"] else ba
            ai_o = int(scene.body_actor[ob])
            blk["m_oth"] = float(scene.actors[ai_o].mass[ob - scene.body_offset[ai_o]])
            blk["ob"] = ob
        # box-sample offset table rows (bp/bbA/bbc sample ga's box; bbB gb's)
        if kind in ("bp", "bbA", "bbB", "bbc"):
            host = ga if kind != "bbB" else gb
            sg = _BOX_SAMPLES[:S] * np.asarray(
                _t3(scene.geom_size[host]), np.float32
            )
            blk["sc_off"] = len(sconst)
            for i in range(3):
                sconst.extend(float(v) for v in sg[:, i])
        blocks.append(blk)

    for p, g in enumerate(tables.cp_geom.tolist()):
        add("cp", g, -1, 2, [o + w * ncp + p for w in range(2)])
    o += 2 * ncp
    for p, g in enumerate(tables.bp_geom.tolist()):
        add("bp", g, -1, 8, [o + ci * nbp + p for ci in range(8)])
    o += 8 * nbp
    for p, (ga, gb) in enumerate(zip(tables.cc_a.tolist(), tables.cc_b.tolist())):
        add("cc", ga, gb, 1, [o + p])
    o += ncc
    for p, (ga, gb) in enumerate(zip(tables.cb_cap.tolist(), tables.cb_box.tolist())):
        add("cb", ga, gb, 3, [o + w * ncb + p for w in range(3)])
    o += 3 * ncb
    for p, (ga, gb) in enumerate(zip(tables.bb_a.tolist(), tables.bb_b.tolist())):
        add("bbA", ga, gb, N_BOX_SAMPLES, [o + ci * nbb + p for ci in range(N_BOX_SAMPLES)])
    o += N_BOX_SAMPLES * nbb
    for p, (ga, gb) in enumerate(zip(tables.bb_a.tolist(), tables.bb_b.tolist())):
        add("bbB", ga, gb, N_BOX_SAMPLES, [o + ci * nbb + p for ci in range(N_BOX_SAMPLES)])
    o += N_BOX_SAMPLES * nbb
    for p, (ga, gb) in enumerate(zip(tables.bbc_a.tolist(), tables.bbc_b.tolist())):
        add("bbc", ga, gb, tables.bbc_samples,
            [o + ci * nbbc + p for ci in range(tables.bbc_samples)])
    o += tables.bbc_samples * nbbc
    assert o == tables.n_con, (o, tables.n_con)
    return blocks, np.asarray(sconst, np.float32)


def pair_blocks(scene, tables):
    """Cached build_pair_blocks (the plan is static per tables instance)."""
    cached = getattr(tables, "_pair_blocks", None)
    if cached is None:
        cached = build_pair_blocks(scene, tables)
        try:
            tables._pair_blocks = cached
        except Exception:
            pass
    return cached


def _block_samples(blk, sconst):
    """Per-axis (S,·,·) box-sample offsets sliced from the broadcast constant
    table (kernel input — see build_pair_blocks)."""
    o, S = blk["sc_off"], blk["S"]
    return tuple(sconst[o + i * S : o + (i + 1) * S] for i in range(3))


def block_geometry(scene, blk, pos, quat, sconst):
    """(point, normal, depth) for one pair block, batched over its S manifold
    samples: every component is (S, 8, 128) (normals may be float 3-tuples for
    plane contacts — they broadcast). Mirrors the per-candidate formulas of
    physics/contact.py narrowphase exactly."""
    kind = blk["kind"]
    if kind == "cp":
        p0, p1, r = _geom_segment(scene, blk["ga"], pos, quat)
        pend = tuple(jnp.stack([p0[i], p1[i]]) for i in range(3))   # (2,8,128)
        return (pend[0], pend[1], pend[2] - r), (0.0, 0.0, 1.0), r - pend[2]
    if kind == "bp":
        gp, gq = _geom_pose(scene, blk["ga"], pos, quat)
        pt = L.add3(gp, L.qrot(gq, _block_samples(blk, sconst)))
        return pt, (0.0, 0.0, 1.0), -pt[2]
    if kind == "cc":
        pa0, pa1, ra = _geom_segment(scene, blk["ga"], pos, quat)
        pb0, pb1, rb = _geom_segment(scene, blk["gb"], pos, quat)
        ca, cb = _segment_closest_lanes(pa0, pa1, pb0, pb1)
        delta = L.sub3(ca, cb)
        dist = L.norm3(delta, eps=0.0)
        normal = L.scale3(delta, 1.0 / jnp.maximum(dist, 1e-9))
        depth = (ra + rb) - dist
        point = L.fma3(cb, normal, rb - 0.5 * jnp.maximum(depth, 0.0))
        lift = lambda t3: tuple(c[None] for c in t3)    # noqa: E731  S=1 axis
        return lift(point), lift(normal), depth[None]
    if kind == "cb":
        p0, p1, r = _geom_segment(scene, blk["ga"], pos, quat)
        gp_b, gq_b = _geom_pose(scene, blk["gb"], pos, quat)
        half = _t3(scene.geom_size[blk["gb"]])
        sp2, _ = _segment_closest_lanes(p0, p1, gp_b, gp_b)
        sp = tuple(jnp.stack([p0[i], p1[i], sp2[i]]) for i in range(3))  # (3,8,128)
        n_w, depth_c, surf = _point_to_box_lanes(sp, gp_b, gq_b, half)
        return surf, n_w, depth_c + r
    if kind in ("bbA", "bbc"):
        gp_a, gq_a = _geom_pose(scene, blk["ga"], pos, quat)
        gp_b, gq_b = _geom_pose(scene, blk["gb"], pos, quat)
        pt = L.add3(gp_a, L.qrot(gq_a, _block_samples(blk, sconst)))
        n_w, depth_c, surf = _point_to_box_lanes(pt, gp_b, gq_b, _t3(scene.geom_size[blk["gb"]]))
        return surf, n_w, depth_c
    # bbB: samples of gb against box ga, reported in (a−b) normal convention
    gp_a, gq_a = _geom_pose(scene, blk["ga"], pos, quat)
    gp_b, gq_b = _geom_pose(scene, blk["gb"], pos, quat)
    pt = L.add3(gp_b, L.qrot(gq_b, _block_samples(blk, sconst)))
    n_w, depth_c, surf = _point_to_box_lanes(pt, gp_a, gq_a, _t3(scene.geom_size[blk["ga"]]))
    return surf, (-n_w[0], -n_w[1], -n_w[2]), depth_c


def _sum_s(x):
    """Reduce a (S,8,128) component (or float 0.0) over the sample axis."""
    return x if isinstance(x, float) else jnp.sum(x, axis=0)


def _sum_s3(t3):
    return tuple(_sum_s(c) for c in t3)


def contacts_lanes(scene, tables, pos, quat, linv, angv, fric_scale, dt_sub,
                   sconst=None):
    """→ (plk_n[b], plk_f[b] Plücker force 3-tuples, net_cf[b], swept_geo).

    swept_geo: list of (block, (point, normal, depth), gate) for blocks
    touching a FREE rigid body or an articulated stiction link — consumed by
    the in-kernel mass-splitting Jacobi impulse sweeps. `gate` is the block's
    broadphase scalar predicate (None when BROADPHASE_GATE is off); every
    downstream gated region re-uses it. Geometry is computed ONCE here and
    reused by every consumer in dynamics_lanes.

    sconst: the box-sample offset table (see build_pair_blocks), broadcast to
    (SC, ·, ·) — a kernel INPUT because Pallas cannot capture array constants.
    None falls back to the host-built table (XLA/interpret contexts)."""
    B = scene.nbody
    tau_c = max(2.0 * dt_sub, 1e-3)
    zeta = 1.0
    blocks, sconst_np = pair_blocks(scene, tables)
    if sconst is None:
        sconst = jnp.asarray(sconst_np).reshape(-1, 1, 1) if len(sconst_np) \
            else jnp.zeros((1, 1, 1), jnp.float32)

    plk_n = [(0.0, 0.0, 0.0)] * B
    plk_f = [(0.0, 0.0, 0.0)] * B
    net_cf = [(0.0, 0.0, 0.0)] * B
    swept_geo = []
    eps_v = float(scene.friction_smoothing_vel)
    dcap = float(scene.max_contact_depth)

    for blk in blocks:
        ba, bb, has_b = blk["ba"], blk["bb"], blk["has_b"]
        fa = fric_scale[blk["ga_geom"]]
        fb = fric_scale[blk["gb_geom"]] if has_b else fa
        mu = blk["mu0"] * 0.5 * (fa + fb)
        emit_a = not blk["a_art"]
        emit_b = has_b and not blk["b_art"]
        # cp/bp contact the ground plane: their normal is the static +z —
        # kept OUT of the gated region so it stays a compile-time constant
        static_n = blk["kind"] in ("cp", "bp")
        if not (emit_a or emit_b or blk["swept"]):
            continue   # fully-articulated non-swept pair: nothing to emit
        gate = block_gate(scene, blk, pos, quat) if BROADPHASE_GATE else None

        def _narrow(blk=blk, ba=ba, bb=bb, has_b=has_b, mu=mu,
                    emit_a=emit_a, emit_b=emit_b, static_n=static_n):
            point, normal, depth = block_geometry(scene, blk, pos, quat, sconst)
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
            depth_cl = jnp.minimum(depth, dcap)

            def force_with(kn_base):
                kn = kn_base / (tau_c * tau_c)
                kd = 2.0 * zeta * kn_base / tau_c
                fn = jnp.where(active, jnp.maximum(kn * depth_cl - kd * vn, 0.0), 0.0)
                ft_s = -(mu * fn / jnp.maximum(vt_norm, eps_v))
                return L.fma3(L.scale3(normal, fn), vt, ft_s), fn

            # side-asymmetric penalty (see physics/contact.py): free bodies
            # feel the mass-scaled stable stiffness, FIXED bodies the couple
            # stiffness, and the DYNAMIC ARTICULATED side of a couple contact
            # gets NO explicit force — its reaction is applied implicitly
            # inside the articulated velocity solve (dynamics_lanes), exactly
            # as the world engine does (an explicit stiff spring on a
            # gram-scale finger is unconditionally unstable)
            out = []
            if emit_a or emit_b:
                # a STATIC side reporting against a free partner emits the
                # SOFT (physically-applied) force — Newton's reaction of what
                # the free body feels — instead of the stiff bookkeeping
                # spring (fixed bodies never move, so this is report-only;
                # see build_pair_blocks a_static/b_static)
                a_soft = blk["a_free"] or (blk["a_static"] and blk["b_free"])
                b_soft = blk["b_free"] or (blk["b_static"] and blk["a_free"])
                force_a, _ = force_with(blk["kn_soft"] if a_soft else blk["kn"])
                if has_b and emit_b:
                    if b_soft == a_soft:
                        force_b = force_a
                    else:
                        force_b, _ = force_with(blk["kn_soft"] if b_soft else blk["kn"])
            if emit_a:
                out += list(_sum_s3(force_a)) + list(_sum_s3(L.cross3(point, force_a)))
            if emit_b:
                out += list(_sum_s3(force_b)) + list(_sum_s3(L.cross3(point, force_b)))
            if blk["swept"]:
                out += list(point)
                if not static_n:
                    out += list(normal)
                out.append(depth)
            return tuple(out)

        vals = list(_gcond(gate, _narrow))
        if emit_a:
            fA, nA = tuple(vals[0:3]), tuple(vals[3:6])
            vals = vals[6:]
            plk_n[ba] = L.add3(plk_n[ba], nA)
            plk_f[ba] = L.add3(plk_f[ba], fA)
            net_cf[ba] = L.add3(net_cf[ba], fA)
        if emit_b:
            fB, nB = tuple(vals[0:3]), tuple(vals[3:6])
            vals = vals[6:]
            plk_n[bb] = L.sub3(plk_n[bb], nB)
            plk_f[bb] = L.sub3(plk_f[bb], fB)
            net_cf[bb] = L.sub3(net_cf[bb], fB)
        if blk["swept"]:
            point = tuple(vals[0:3])
            vals = vals[3:]
            normal = (0.0, 0.0, 1.0) if static_n else tuple(vals[0:3])
            if not static_n:
                vals = vals[3:]
            depth = vals[0]
            swept_geo.append((blk, (point, normal, depth), gate))
    return plk_n, plk_f, net_cf, swept_geo


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


def _skew_cols(r):
    """skew(r) entries as a nested tuple S[i][j] with exact zeros on the
    diagonal (r components may carry a sample axis)."""
    return (
        (0.0, -r[2], r[1]),
        (r[2], 0.0, -r[0]),
        (-r[1], r[0], 0.0),
    )


def _quad(Kf, d3):
    """max(dᵀKd, floor) for (K, floor) from the per-block inverse-mass."""
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


def dynamics_lanes(scene, masks_list, state, pos, quat, linv, angv, axis_w,
                   plk_n, plk_f, mass_scale, dt, swept_geo=None,
                   impulse_sweeps=2, fric_scale=None,
                   world_fidelity=False):
    """Implicit velocity update + integration for every dynamic actor.
    masks_list: per-actor ActorMasks (from physics.dynamics.build_actor_masks).
    mass_scale: list of per-body tiles (or floats). Mutates/returns new state dict.

    swept_geo: list of (pair block, (point, normal, depth), gate) from
    contacts_lanes — the impulse-pass workload, batched over each block's
    manifold samples; `gate` is the block's broadphase predicate (None when
    BROADPHASE_GATE is off).

    world_fidelity=True (the fused WORLD step; K=1 so VMEM is plentiful)
    adds PhysX-style warm starting from state["lam"] (persisting across
    substeps and control steps) and the post-sweep stiction snap — a held
    grasp drifts mm/s off the pads without these (see
    contact.impulse_contact_pass)."""
    new_state = dict(state)
    deferred = []            # free single-body actors awaiting impulse pass
    new_q = list(state["q"])
    new_qd = list(state["qd"])
    new_rp = list(state["root_pos"])
    new_rq = list(state["root_quat"])
    new_rlv = list(state["root_linvel"])
    new_rav = list(state["root_angvel"])
    swept_geo = swept_geo or []

    # couple contacts (articulated↔free, i.e. grasping): route blocks to
    # their articulated actor. The articulated side got NO explicit penalty in
    # contacts_lanes; it enters the velocity solve IMPLICITLY (Baraff JᵀJ
    # terms) and the impulse sweeps TWO-WAY (joint-space effective mass Ψ) —
    # mirroring physics/stacked.py + contact.impulse_contact_pass.
    couple_by_actor: Dict[int, list] = {}
    sta_bodies_by_actor: Dict[int, set] = {}
    for blk, geo, gate in swept_geo:
        if blk["a_art"] or blk["b_art"]:
            art_b = blk["ba"] if blk["a_art"] else blk["bb"]
            aid = int(scene.body_actor[art_b])
            e = 1.0 if blk["a_art"] else -1.0
            couple_by_actor.setdefault(aid, []).append((blk, geo, art_b, e, gate))
        # art↔static stiction blocks need the actor's Ψ/factor too
        # (friction-only — they add NO implicit normal terms)
        if blk["a_sta"] or blk["b_sta"]:
            art_b = blk["ba"] if blk["a_sta"] else blk["bb"]
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
                if "finger" in art.dof_names[kdof]:
                    # motor-curve damping |u|/v_max + load-proportional
                    # spindle stiction (same law as stacked finger_motor): a
                    # constant force on a 15 g finger bang-bangs on contact
                    # and juggles the caged block out of the grasp; the
                    # stiction arrests the free closing-axis translation mode
                    from ...physics.stacked import MU_SPINDLE as _MU_SP

                    dk = dk + jnp.abs(tk) * (
                        1.0 / max(float(art.dof_maxvel[kdof]), 1e-6)
                        + _MU_SP / (jnp.abs(qdk) + 0.02)
                    )
            else:
                tk, dk = 0.0, 0.0
            dk = dk + float(art.dof_damping[kdof])
            # implicit Coulomb friction (same law as stacked.drive_terms_stacked)
            dk = dk + float(art.dof_friction[kdof]) / (jnp.abs(qdk) + 0.02)
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
            # X = (p×n, n), κ = dt·kn — batched over each block's S samples
            # and reduced with one sum per (i, j) coordinate pair.
            for blk, geo, art_b, e, gate in cpl:
                lb = art_b - bo               # local link index
                sub_coords = [j for j in range(nv) if m.subtree[j, lb]]

                def _couple(blk=blk, geo=geo, e=e, sub_coords=sub_coords):
                    pt, n, depth_raw = geo
                    depth_c = jnp.minimum(depth_raw, float(scene.max_contact_depth))
                    act = (depth_c > 0.0).astype(jnp.float32)
                    X6 = (*L.cross3(pt, n), *n)
                    Jc = {}
                    for j in sub_coords:
                        Jc[j] = sum(X6[r] * S[j][r] for r in range(6))
                    kn_c = blk["kn"] / (tau_c_g * tau_c_g)
                    # damper capped at the free side's momentum-transfer
                    # scale (see physics/stacked.py DAMP_CAP_BETA): the raw
                    # kd pried fingers open with ~200 N phantom forces on
                    # sweep-onset velocity transients (r4 transport slip)
                    ob = blk["bb"] if blk["a_art"] else blk["ba"]
                    kd_c = jnp.minimum(
                        2.0 * blk["kn"] / tau_c_g,
                        _DAMP_BETA * blk["m_oth"] * mass_scale[ob]
                        / (dt * blk["npts"]),
                    )
                    kap = dt * kn_c
                    v_oth = L.add3(linv[ob], L.cross3(angv[ob], L.sub3(pt, pos[ob])))
                    v_oth_n = L.dot3(v_oth, n)
                    coefM = dt * (kd_c + kap) * act
                    coefR = dt * (e * kn_c * jnp.maximum(depth_c, 0.0)
                                  + (kd_c + kap) * v_oth_n) * act
                    out = []
                    for i in sub_coords:
                        out.append(jnp.sum(coefR * Jc[i], axis=0))
                        MJi = coefM * Jc[i]
                        for j in sub_coords:
                            if j < i:
                                continue
                            out.append(jnp.sum(MJi * Jc[j], axis=0))
                    return tuple(out)

                vals = list(_gcond(gate, _couple))
                vi = 0
                for i in sub_coords:
                    rhs[i] = rhs[i] + vals[vi]
                    vi += 1
                    for j in sub_coords:
                        if j < i:
                            continue
                        v = vals[vi]
                        vi += 1
                        Msolve[i][j] = Msolve[i][j] + v
                        if j != i:
                            Msolve[j][i] = Msolve[j][i] + v

        if cpl or sta_bodies:
            L_chol = L.cholesky_factor(Msolve)
            u_new = L.cholesky_solve_factored(L_chol, rhs)
            # joint-space operational inverse inertia Ψ_b = Φ_b M⁻¹ Φ_bᵀ per
            # contact link (consumed by the two-way impulse sweeps)
            psi_by_body = {}
            art_bodies = sorted(
                {cb for (_, _, cb, _, _) in (cpl or [])} | (sta_bodies or set())
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

    # ---- mass-splitting Jacobi impulse sweeps for free rigid bodies — the
    # in-kernel twin of contact.impulse_contact_pass, batched per pair block.
    # Same algorithm as the XLA engine: per-body/per-actor active-contact
    # counts split each contact's effective mass, relax=0.9, impulses applied
    # at sweep END from a frozen velocity snapshot (Jacobi). Articulated
    # couple/stiction sides participate TWO-WAY via Ψ in the effective mass
    # and an EXACT generalized fold-back ΔU = M⁻¹ΦᵀY per sweep.
    if swept_geo and impulse_sweeps > 0 and (deferred or art_ctx):
        beta, slop, relax = 0.2, 2e-3, 0.9
        dcap = float(scene.max_contact_depth)
        tau_c = max(2.0 * dt, 1e-3)
        nblk = len(swept_geo)
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

        # per-block static routing + per-substep invariants: activity masks,
        # active-contact counts (geometry is fixed within a substep, so the
        # XLA pass's per-iteration counts are constants here), friction
        # coefficient, contact-space inverse-mass matrices
        blk_act = []            # (S,8,128) activity per block
        blk_mu = []
        for blk, geo, gate in swept_geo:
            # gated-off blocks carry zero depth ⇒ act 0 — no cond needed here
            d_c = jnp.minimum(geo[2], dcap)
            blk_act.append((d_c > 0.0).astype(jnp.float32))
            fa_ = fric_scale[blk["ga_geom"]] if fric_scale is not None else 1.0
            fb_ = (fric_scale[blk["gb_geom"]] if blk["has_b"] else fa_) if fric_scale is not None else 1.0
            blk_mu.append(blk["mu0"] * 0.5 * (fa_ + fb_))

        count_body: Dict[int, object] = {}     # free bodies: Σ active
        count_act: Dict[int, object] = {}      # art actors: Σ active (art/sta)
        for si, (blk, geo, gate) in enumerate(swept_geo):
            act_sum = _sum_s(blk_act[si])
            for b2, fr2 in ((blk["ba"], blk["a_free"]), (blk["bb"], blk["b_free"])):
                if fr2:
                    count_body[b2] = count_body.get(b2, 0.0) + act_sum
            if blk["a_art"] or blk["b_art"] or blk["a_sta"] or blk["b_sta"]:
                b_g = blk["ba"] if (blk["a_art"] or blk["a_sta"]) else blk["bb"]
                aid = body_actor_art[b_g]
                count_act[aid] = count_act.get(aid, 0.0) + act_sum

        def _inv_mass_block(blk, geo):
            """3×3 contact-space inverse-mass matrix K per sample: the
            effective inverse mass along ANY unit direction d is dᵀKd — free
            sides contribute 1/m·I₃ + skew(r)ᵀ(I_w)⁻¹skew(r), articulated /
            static sides GᵀΨG with G = [skew(p); I₃]. Geometry, masses and Ψ
            are fixed within a substep → computed once, reused every sweep.
            Unlike the old GS kernel, the active-contact count is NOT folded
            in here — it splits the impulse itself (n_eff), matching the XLA
            pass exactly."""
            pt = geo[0]
            is_cpl = (
                blk["a_art"] or blk["b_art"] or blk["a_sta"] or blk["b_sta"]
            ) and TWO_WAY_SWEEPS
            art_is_a = blk["a_art"] or blk["a_sta"]
            K = [[1e-9 if i == j else 0.0 for j in range(3)] for i in range(3)]
            for b2, fr2 in ((blk["ba"], blk["a_free"]), (blk["bb"], blk["b_free"])):
                if not fr2:
                    continue
                r2 = L.sub3(pt, state["root_pos"][body2actor[b2]])
                sk = _skew_cols(r2)
                Iw2 = invIw[b2]
                # T = I_w⁻¹ · skew(r)  (diagonal of skew is exactly zero)
                T = [
                    [Iw2[i][1] * sk[1][0] + Iw2[i][2] * sk[2][0],
                     Iw2[i][0] * sk[0][1] + Iw2[i][2] * sk[2][1],
                     Iw2[i][0] * sk[0][2] + Iw2[i][1] * sk[1][2]]
                    for i in range(3)
                ]
                for a in range(3):
                    K[a][a] = K[a][a] + inv_m[b2]
                    for b3 in range(a, 3):
                        # K += skewᵀ T — skew's col a has zeros at row a
                        K[a][b3] = K[a][b3] + sum(
                            sk[i][a] * T[i][b3] for i in range(3) if i != a
                        )
            if is_cpl:
                b2 = blk["ba"] if art_is_a else blk["bb"]
                psi2 = art_ctx[body_actor_art[b2]]["psi"][b2]
                P = _skew_cols(pt)
                # V[r][b] = Σ_s Ψ[r][s]·P[s][b] + Ψ[r][3+b]
                V = [
                    [psi2[r][1] * P[1][0] + psi2[r][2] * P[2][0] + psi2[r][3],
                     psi2[r][0] * P[0][1] + psi2[r][2] * P[2][1] + psi2[r][4],
                     psi2[r][0] * P[0][2] + psi2[r][1] * P[1][2] + psi2[r][5]]
                    for r in range(6)
                ]
                for a in range(3):
                    ridx = [i for i in range(3) if i != a]
                    for b3 in range(a, 3):
                        gpg = (P[ridx[0]][a] * V[ridx[0]][b3]
                               + P[ridx[1]][a] * V[ridx[1]][b3]
                               + V[3 + a][b3])
                        K[a][b3] = K[a][b3] + gpg
            for a in range(3):          # mirror the upper triangle
                for b3 in range(a + 1, 3):
                    K[b3][a] = K[a][b3]
            # direction-independent floor: what a DEGENERATE (zero) direction
            # must see so quad() never divides to ±inf (e.g. a box contact
            # whose witness point sits exactly on a face-center symmetry
            # plane: sign(0)=0 zeroes the normal). Real unit directions give
            # dᵀKd ≥ floor automatically (the rotational/Ψ terms are PSD).
            floor = 1e-9
            for b2, fr2 in ((blk["ba"], blk["a_free"]), (blk["bb"], blk["b_free"])):
                if fr2:
                    floor = floor + inv_m[b2]
            return K, floor

        # gated K cache: a skipped block gets K=0 / floor=1 / k_n=1 — its
        # impulses are exactly zero anyway (act=0), the nonzero floor only
        # keeps the sweep's divisions finite
        def _k_entry(blk, geo, gate):
            def _live(blk=blk, geo=geo):
                K, floor = _inv_mass_block(blk, geo)
                kn_ = _quad((K, floor), geo[1])
                return (tuple(tuple(K[i][j] + jnp.zeros(()) for j in range(3))
                              for i in range(3)),
                        floor + jnp.zeros(()), kn_)
            if gate is None:
                return _live()
            shapes = jax.eval_shape(_live)
            K0 = tuple(tuple(jnp.zeros(shapes[0][i][j].shape, shapes[0][i][j].dtype)
                             for j in range(3)) for i in range(3))
            return jax.lax.cond(
                gate, _live,
                lambda: (K0, jnp.ones(shapes[1].shape, shapes[1].dtype),
                         jnp.ones(shapes[2].shape, shapes[2].dtype)))

        K_cache = []
        k_n_cache = []
        for blk, geo, gate in swept_geo:
            K_, floor_, kn_ = _k_entry(blk, geo, gate)
            K_cache.append((K_, floor_))
            k_n_cache.append(kn_)
        # per-block n_eff (a per-env tile): count over BOTH free sides plus
        # the articulated ACTOR's count (feet couple through a shared floating
        # base — per-body counts would let the base take ~4× the correction)
        n_eff_blk = []
        for si, (blk, geo, gate) in enumerate(swept_geo):
            ne = 0.0
            for b2, fr2 in ((blk["ba"], blk["a_free"]), (blk["bb"], blk["b_free"])):
                if fr2:
                    ne = ne + count_body[b2]
            if blk["a_art"] or blk["b_art"] or blk["a_sta"] or blk["b_sta"]:
                b_g = blk["ba"] if (blk["a_art"] or blk["a_sta"]) else blk["bb"]
                ne = ne + count_act[body_actor_art[b_g]]
            n_eff_blk.append(jnp.maximum(ne, 1.0))

        # per-block fn_seed coefficients (friction-cone seeding from the
        # implicit/penalty normal force the velocity solve applied)
        def _fn_seed(si, vn):
            blk, geo, _ = swept_geo[si]
            depth = jnp.minimum(geo[2], dcap)
            if blk["a_sta"] or blk["b_sta"]:
                kn_c = blk["kn"] / (tau_c * tau_c)
                kd_c = 2.0 * blk["kn"] / tau_c
                return jnp.maximum(kn_c * jnp.maximum(depth, 0.0) - kd_c * vn, 0.0)
            if (blk["a_art"] or blk["b_art"]) and TWO_WAY_SWEEPS:
                kn_c = blk["kn"] / (tau_c * tau_c)
                kd_c = jnp.minimum(
                    2.0 * blk["kn"] / tau_c,
                    _DAMP_BETA * blk["m_oth"] * mass_scale[blk["ob"]]
                    / (dt * blk["npts"]),
                )
                return jnp.maximum(
                    kn_c * jnp.maximum(depth, 0.0) - (kd_c + dt * kn_c) * vn, 0.0
                )
            if blk["has_b"] and (blk["a_free"] != blk["b_free"]):
                return (blk["kn"] / (tau_c * tau_c)) * jnp.maximum(depth, 0.0)
            return 0.0

        defer_list = list(deferred)
        couple_aids = sorted(art_ctx)
        zero_t = jnp.zeros_like(state["root_pos"][0][0])

        def _tile(x):
            return x + zero_t if isinstance(x, float) else x

        def _zero_s(si):
            return jnp.zeros_like(blk_act[si])

        def _pack_carry(rlv, rav, unew, ln, lt):
            c_rlv = tuple(tuple(_tile(v) for v in rlv[ai2]) for ai2 in defer_list)
            c_rav = tuple(tuple(_tile(v) for v in rav[ai2]) for ai2 in defer_list)
            c_u = tuple(tuple(_tile(v) for v in unew[aid]) for aid in couple_aids)
            c_ln = tuple(ln)
            c_lt = tuple(tuple(t3) for t3 in lt)
            return (c_rlv, c_rav, c_u, c_ln, c_lt)

        def _unpack_carry(carry):
            c_rlv, c_rav, c_u, c_ln, c_lt = carry
            rlv = {ai2: c_rlv[k] for k, ai2 in enumerate(defer_list)}
            rav = {ai2: c_rav[k] for k, ai2 in enumerate(defer_list)}
            unew = {aid: list(c_u[k]) for k, aid in enumerate(couple_aids)}
            return rlv, rav, unew, list(c_ln), [tuple(t3) for t3 in c_lt]

        def _block_contribs(si, imp):
            """One block's summed impulse contributions as a flat list: per
            FREE side 3 Δp + 3 Δτ (about the body root), then 6 Y (Plücker)
            for an articulated/static side — computed INSIDE the block's
            gated region so the S-axis reductions are skipped with it."""
            blk, geo, _ = swept_geo[si]
            pt = geo[0]
            out = []
            for b, fr, sgn in ((blk["ba"], blk["a_free"], 1.0), (blk["bb"], blk["b_free"], -1.0)):
                if not fr:
                    continue
                ai2 = body2actor[b]
                si3 = L.scale3(imp, sgn)
                out += list(_sum_s3(si3))
                r = L.sub3(pt, state["root_pos"][ai2])
                out += list(_sum_s3(L.cross3(r, si3)))
            if (blk["a_art"] or blk["b_art"] or blk["a_sta"] or blk["b_sta"]) and TWO_WAY_SWEEPS:
                art_is_a = blk["a_art"] or blk["a_sta"]
                si3 = L.scale3(imp, 1.0 if art_is_a else -1.0)
                out += list(_sum_s3(L.cross3(pt, si3))) + list(_sum_s3(si3))
            return out

        def _scatter_contribs(si, vals, dP, dT, Y_body):
            """Accumulate _block_contribs output onto the shared Jacobi sums
            (static routing — runs OUTSIDE the gated region)."""
            blk = swept_geo[si][0]
            vi = 0
            for b, fr in ((blk["ba"], blk["a_free"]), (blk["bb"], blk["b_free"])):
                if not fr:
                    continue
                ai2 = body2actor[b]
                dP[ai2] = L.add3(dP[ai2], tuple(vals[vi:vi + 3]))
                dT[ai2] = L.add3(dT[ai2], tuple(vals[vi + 3:vi + 6]))
                vi += 6
            if (blk["a_art"] or blk["b_art"] or blk["a_sta"] or blk["b_sta"]) and TWO_WAY_SWEEPS:
                b_g = blk["ba"] if (blk["a_art"] or blk["a_sta"]) else blk["bb"]
                Yb = Y_body[b_g]
                for r in range(6):
                    Yb[r] = Yb[r] + vals[vi + r]

        def _commit_deltas(dP, dT, Y_body, new_rlv, new_rav, unew_by):
            """Jacobi end-of-sweep apply: free-body velocity updates from the
            accumulated impulse sums, exact generalized fold-back per couple
            actor: u += M⁻¹ΦᵀY."""
            for ai2 in defer_list:
                b = scene.body_offset[ai2]
                new_rlv[ai2] = L.fma3(new_rlv[ai2], dP[ai2], inv_m[b])
                tor = dT[ai2]
                dang = tuple(sum(invIw[b][i][j] * tor[j] for j in range(3)) for i in range(3))
                new_rav[ai2] = L.add3(new_rav[ai2], dang)
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
            return new_rlv, new_rav, unew_by

        def _sweep_body(_, carry):
            new_rlv, new_rav, unew_by, lam_n, lam_t = _unpack_carry(carry)
            # frozen velocity snapshot for this sweep (Jacobi): post-solve
            # spatial velocities (ω, v_O) of articulated contact links
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
            dP = {ai2: (0.0, 0.0, 0.0) for ai2 in defer_list}
            dT = {ai2: (0.0, 0.0, 0.0) for ai2 in defer_list}

            def body_vel_at(b, point):
                if b in body2actor:
                    ai2 = body2actor[b]
                    return L.add3(new_rlv[ai2], L.cross3(new_rav[ai2], L.sub3(point, state["root_pos"][ai2])))
                if b in v6_art:
                    v6 = v6_art[b]
                    return L.add3((v6[3], v6[4], v6[5]), L.cross3((v6[0], v6[1], v6[2]), point))
                return L.add3(linv[b], L.cross3(angv[b], L.sub3(point, pos[b])))

            for si, (blk, geo, gate) in enumerate(swept_geo):
                def _blk_sweep(si=si, blk=blk, geo=geo,
                               ln0=lam_n[si], lt0=lam_t[si]):
                    pt, n, depth_raw = geo
                    depth = jnp.minimum(depth_raw, dcap)
                    active = blk_act[si] > 0.0
                    target = jnp.minimum(beta * jnp.maximum(depth - slop, 0.0) / dt, 0.5)
                    va = body_vel_at(blk["ba"], pt)
                    vb = body_vel_at(blk["bb"], pt) if blk["has_b"] else (0.0, 0.0, 0.0)
                    v_rel = L.sub3(va, vb)
                    vn = L.dot3(v_rel, n)
                    is_sta_b = blk["a_sta"] or blk["b_sta"]
                    n_eff = n_eff_blk[si]

                    if is_sta_b:
                        # art↔static: FRICTION-ONLY (normal carried by the
                        # stiff penalty — an impulse on top would double the
                        # support)
                        new_lam = ln0 + jnp.zeros_like(blk_act[si])
                        imp = (0.0, 0.0, 0.0)
                    else:
                        d_lam = jnp.where(
                            active, -(vn - target) / (k_n_cache[si] * n_eff) * relax, 0.0
                        )
                        new_lam = jnp.maximum(ln0 + d_lam, 0.0)
                        d_impulse = new_lam - ln0
                        imp = L.scale3(n, d_impulse)
                    # friction: tangential impulse against the same frozen
                    # snapshot, n_eff-split, vector cone projection on the
                    # ACCUMULATED impulse (identical to impulse_contact_pass —
                    # stiction must converge tightly or a grasped object
                    # drifts through the pads)
                    vt = L.sub3(v_rel, L.scale3(n, vn))
                    vt_n = L.norm3(vt, eps=1e-9)
                    t_dir = L.scale3(vt, 1.0 / vt_n)
                    k_t = _quad(K_cache[si], t_dir)
                    jt_try = tuple(
                        jnp.where(active, -vt[i] / (k_t * n_eff), 0.0) for i in range(3)
                    )
                    fn_seed = _fn_seed(si, vn)
                    cap = blk_mu[si] * (new_lam + fn_seed * dt)
                    lam_t_new = L.add3(lt0, jt_try)
                    ltn = L.norm3(lam_t_new, eps=1e-9)
                    sc = jnp.minimum(1.0, cap / ltn)
                    lam_t_proj = L.scale3(lam_t_new, sc)
                    jt = L.sub3(lam_t_proj, lt0)
                    imp = L.add3(imp, jt)
                    return (new_lam, *lam_t_proj, *_block_contribs(si, imp))

                vals = _gcond(gate, _blk_sweep)
                lam_n[si] = vals[0]
                lam_t[si] = tuple(vals[1:4])
                _scatter_contribs(si, list(vals[4:]), dP, dT, Y_body)

            new_rlv, new_rav, unew_by = _commit_deltas(
                dP, dT, Y_body, new_rlv, new_rav, unew_by
            )
            return _pack_carry(new_rlv, new_rav, unew_by, lam_n, lam_t)

        # λ accumulators persisting across sweeps (and, at world fidelity,
        # across substeps/control steps through state["lam"]): normal impulse
        # λ_n (≥ 0 projection) + vector tangential impulse with exact cone
        # projection — both fidelity modes now share the XLA pass's treatment.
        lam_warm = state.get("lam") if world_fidelity else None
        if lam_warm is not None:
            # PhysX-style persistent-contact warm start: re-apply last
            # substep's converged impulses on currently-active candidates,
            # then let the sweeps correct the (small) error. Blocks are a
            # static table, so row si is always the same pair.
            lam0_n = []
            lam0_t = []
            Yw = {b_g: [0.0] * 6 for b_g in body_actor_art}
            dPw = {ai2: (0.0, 0.0, 0.0) for ai2 in defer_list}
            dTw = {ai2: (0.0, 0.0, 0.0) for ai2 in defer_list}
            for si, (blk, geo, gate) in enumerate(swept_geo):
                def _warm(si=si, geo=geo):
                    wn, wt = lam_warm[si]
                    act = blk_act[si]
                    lnw = wn * act
                    ltw = tuple(wt[i] * act for i in range(3))
                    imp = L.add3(L.scale3(geo[1], lnw), ltw)
                    return (lnw, *ltw, *_block_contribs(si, imp))

                vals = _gcond(gate, _warm)
                lam0_n.append(vals[0])
                lam0_t.append(tuple(vals[1:4]))
                _scatter_contribs(si, list(vals[4:]), dPw, dTw, Yw)
            unew0 = {aid: art_ctx[aid]["u_new"] for aid in couple_aids}
            rlv0 = {ai2: new_rlv[ai2] for ai2 in defer_list}
            rav0 = {ai2: new_rav[ai2] for ai2 in defer_list}
            rlv0, rav0, unew0 = _commit_deltas(dPw, dTw, Yw, rlv0, rav0, unew0)
        else:
            lam0_n = [_zero_s(si) for si in range(nblk)]
            lam0_t = [(_zero_s(si), _zero_s(si), _zero_s(si)) for si in range(nblk)]
            unew0 = {aid: art_ctx[aid]["u_new"] for aid in couple_aids}
            rlv0 = {ai2: new_rlv[ai2] for ai2 in defer_list}
            rav0 = {ai2: new_rav[ai2] for ai2 in defer_list}

        carry0 = _pack_carry(rlv0, rav0, unew0, lam0_n, lam0_t)
        carry = jax.lax.fori_loop(0, impulse_sweeps, _sweep_body, carry0)
        rlv_f, rav_f, unew_f, lamf_n, lamf_t = _unpack_carry(carry)
        for ai2 in defer_list:
            new_rlv[ai2] = rlv_f[ai2]
            new_rav[ai2] = rav_f[ai2]
        for aid in couple_aids:
            art_ctx[aid]["u_new"] = unew_f[aid]
        if world_fidelity:
            new_state["lam"] = [
                (lamf_n[si], tuple(lamf_t[si])) for si in range(nblk)
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
            for si, (blk, geo, gate) in enumerate(swept_geo):
                if not (blk["a_art"] or blk["b_art"]):
                    continue
                b_free_g = blk["bb"] if blk["a_art"] else blk["ba"]
                if b_free_g not in A_by:
                    A_by[b_free_g] = [[0.0] * 6 for _ in range(6)]
                    b_by[b_free_g] = [0.0] * 6

                def _snap_rows(si=si, blk=blk, geo=geo, b_free_g=b_free_g):
                    pt, n, depth_raw = geo
                    act = blk_act[si]
                    b_art_g = blk["ba"] if blk["a_art"] else blk["bb"]
                    e_snap = -1.0 if blk["a_art"] else 1.0   # +1: FREE is side a
                    ai2 = body2actor[b_free_g]
                    v_free = L.add3(new_rlv[ai2], L.cross3(new_rav[ai2], L.sub3(pt, state["root_pos"][ai2])))
                    v6 = v6f[b_art_g]
                    v_art = L.add3((v6[3], v6[4], v6[5]), L.cross3((v6[0], v6[1], v6[2]), pt))
                    # v_rel in candidate (a−b) order
                    v_rel = L.sub3(v_art, v_free) if blk["a_art"] else L.sub3(v_free, v_art)
                    vn_f = L.dot3(v_rel, n)
                    kn_c = blk["kn"] / (tau_c * tau_c)
                    kd_c = jnp.minimum(
                        2.0 * blk["kn"] / tau_c,
                        _DAMP_BETA * blk["m_oth"] * mass_scale[blk["ob"]]
                        / (dt * blk["npts"]),
                    )
                    fn_imp = jnp.maximum(
                        kn_c * jnp.maximum(jnp.minimum(depth_raw, dcap), 0.0)
                        - (kd_c + dt * kn_c) * vn_f, 0.0
                    )
                    cap_f = blk_mu[si] * (lamf_n[si] + fn_imp * dt)
                    lt_n = L.norm3(lamf_t[si], eps=0.0)
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
                    PX = [[sum(P[i][k2] * X[k2][j] for k2 in range(3)) for j in range(6)] for i in range(3)]
                    Pv = [sum(P[i][k2] * (e_snap * v_rel[k2]) for k2 in range(3)) for i in range(3)]
                    out = []
                    for i in range(6):
                        out.append(-_sum_s(w_st * sum(X[k2][i] * Pv[k2] for k2 in range(3))))
                        for j in range(6):
                            out.append(_sum_s(
                                w_st * sum(X[k2][i] * PX[k2][j] for k2 in range(3))
                            ))
                    return tuple(out)

                vals = _gcond(gate, _snap_rows)
                A_c = A_by[b_free_g]
                b_c = b_by[b_free_g]
                vi = 0
                for i in range(6):
                    b_c[i] = b_c[i] + vals[vi]
                    vi += 1
                    for j in range(6):
                        A_c[i][j] = A_c[i][j] + vals[vi]
                        vi += 1
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
                  skip_contacts=False, skip_dynamics=False, sconst=None):
    """One full substep; returns the new state dict (with per-body net contact
    forces under "net_cf" — used by cost terms after the last substep).

    skip_contacts / skip_dynamics: PROFILING ablations only (scripts/
    profile_kernel.py) — they produce physically wrong states but isolate the
    per-phase VPU cost of the narrowphase+penalty section and the articulated
    solve + impulse sweeps."""
    B = scene.nbody
    pos, quat, linv, angv, axis_w = fk_lanes(scene, state)
    if skip_contacts:
        zero3 = (0.0, 0.0, 0.0)
        plk_n, plk_f, net_cf, swept_geo = (
            [zero3] * B, [zero3] * B, [zero3] * B, [],
        )
    else:
        plk_n, plk_f, net_cf, swept_geo = contacts_lanes(
            scene, tables, pos, quat, linv, angv, fric_scale, dt, sconst=sconst
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
            # blocks always flow: couple contacts are solved IMPLICITLY in
            # the velocity solve even in penalty-only mode (impulse_sweeps=0
            # only disables the sweeps)
            swept_geo=swept_geo,
            impulse_sweeps=impulse_sweeps, fric_scale=fric_scale,
            world_fidelity=world_fidelity,
        )
    new_state["net_cf"] = net_cf
    return new_state


def swept_blocks(scene, tables):
    """Pair blocks participating in the impulse pass, in batched block order."""
    return [blk for blk in pair_blocks(scene, tables)[0] if blk["swept"]]


def free_cand_indices(scene, tables) -> np.ndarray:
    """Flat contact-table indices of the impulse-pass candidates, in BATCHED
    BLOCK order (concatenated per-block sample rows). The fused world step
    uses this to map its persistent-λ rows onto SimState.contact_lam —
    sharing the warm-start cache with the XLA engine's impulse pass (whose
    lam rows are in flat table order)."""
    out = []
    for blk in swept_blocks(scene, tables):
        out.extend(blk["rows"].tolist())
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
