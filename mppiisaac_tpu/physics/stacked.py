"""Stacked whole-scene dynamics — the TPU-first formulation.

The naive engine (kinematics.py/dynamics.py) unrolls Python loops over links,
emitting O(links) small XLA ops per substep; correct, and kept for unit
tests, but compile time and VPU utilisation suffer on big scenes. This module
restates the SAME math as a fixed sequence of batched array ops whose count is
independent of scene size:

* All actors' bodies live in ONE global array (B bodies, NV generalized
  velocity coordinates = 6 per floating base + joint DOFs).
* FK: per-body local joint transforms (vectorized) composed up the tree by
  **pointer doubling** — ⌈log2(depth)⌉ gather+compose passes instead of a
  per-link chain.
* Velocities: body Plücker velocities are ONE (B,NV)×(NV,6) mask-matmul of the
  motion subspaces against generalized velocities.
* CRBA: composite inertias are ONE (NV,B)×(B,36) matmul; per-actor mass-matrix
  blocks are gathered into a padded (A_dyn, nv_max, 6) tensor and contracted
  with a single batched matmul (MXU) + static ancestry mask.
* Bias (RNEA, qdd=0): acceleration propagation is the same ancestor-mask
  matmul applied to per-dof velocity-product terms.
* One padded batched linear solve integrates every dynamic actor at once.

Under vmap over K samples, every op here is (K, ·)-batched and the two big
contractions hit the MXU. This is the engine behind `Engine.step`.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .math3d import quat_from_axis_angle, quat_integrate, quat_mul, quat_normalize, quat_rotate, quat_to_matrix
from .model import (
    DRIVE_EFFORT,
    DRIVE_POSITION,
    DRIVE_VELOCITY,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
)
from .scene_model import SceneModel
from .types import ModelParams, SimState

_F32 = np.float32

# physics contractions must run in true f32: the TPU default matmul
# precision is bf16, which destabilizes contact dynamics within a few substeps
_PREC = jax.lax.Precision.HIGHEST

# couple-contact damper cap margin (see stacked_substep implicit couple
# terms): kd_eff ≤ DAMP_CAP_BETA · m_free / (dt · n_pts)
DAMP_CAP_BETA = 4.0
# effort-finger spindle stiction coefficient: implicit resistance μ_s·|u|
# against back-driving, as a fraction of the commanded axial load (see
# drive_terms_stacked). 0.3 ⇒ a −6 N squeeze resists ~1.8 N of lateral walk.
MU_SPINDLE = 0.3


@dataclass
class StackedModel:
    scene: SceneModel
    # global body arrays (B,)
    B: int
    NV: int                     # total generalized velocity coords
    D: int                      # actuated joint dofs (== scene.ndof)
    parent: np.ndarray          # (B,) -1 for actor roots
    body_actor: np.ndarray      # (B,)
    jtype: np.ndarray           # (B,)
    jpos: np.ndarray            # (B,3)
    jquat: np.ndarray           # (B,4)
    jaxis: np.ndarray           # (B,3)
    body_jdof: np.ndarray       # (B,) actuated dof id in [0,D) or -1
    mass: np.ndarray            # (B,)
    com: np.ndarray             # (B,3)
    inertia: np.ndarray         # (B,3,3)
    grav_mask: np.ndarray       # (B,) 1.0 unless actor disables gravity or is static
    depth_passes: int
    parent_chain: List[np.ndarray]  # static pointer-doubling index chains
    # generalized-coordinate maps
    dofc_body: np.ndarray       # (NV,) body owning each velocity coordinate
    dofc_is_joint: np.ndarray   # (NV,) bool
    dofc_jdof: np.ndarray       # (NV,) actuated dof id or -1
    jd_coord: np.ndarray        # (D,) coordinate index of each actuated dof
    base_S: np.ndarray          # (NV,6) constant rows for base coords (identity), 0 for joint rows
    # masks
    anc_dof: np.ndarray         # (B,NV) float: coord j ancestor-or-self of body b
    subtree: np.ndarray         # (NV,B) float: body in subtree of coord j's joint
    # dynamic-actor padded solve tables
    A_dyn: int
    nv_max: int
    act_coords: np.ndarray      # (A_dyn, nv_max) indices into NV, padded with NV
    act_pad: np.ndarray         # (A_dyn, nv_max) 1.0 where real coord
    act_anc: np.ndarray         # (A_dyn, nv_max, nv_max) ancestry mask for CRBA
    act_actor: np.ndarray       # (A_dyn,) actor index
    act_floating: np.ndarray    # (A_dyn,) bool
    # actuated-dof parameter arrays (D,)
    dof_lower: np.ndarray
    dof_upper: np.ndarray
    dof_effort: np.ndarray
    dof_maxvel: np.ndarray
    dof_damping: np.ndarray
    dof_friction: np.ndarray
    dof_armature: np.ndarray
    drive_mode: np.ndarray
    drive_kp: np.ndarray
    drive_kd: np.ndarray
    # static pick/scatter matrices (one-hot constants)
    base_pick: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), _F32))
    joint_pick: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), _F32))
    uscatter: np.ndarray = field(default_factory=lambda: np.zeros((0, 0), _F32))
    body_jdof_clipped: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    dof_gate_body: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    # effort-mode FINGER dofs (D,): 1.0 where the raw-effort command drives a
    # gripper finger. These get the implicit motor curve τ = u − (|u|/v_max)qd⁺
    # instead of a bare constant force (see drive_terms_stacked).
    finger_motor: np.ndarray = field(default_factory=lambda: np.zeros(0, _F32))


def build_stacked(scene: SceneModel) -> StackedModel:
    B = scene.nbody
    D = scene.ndof
    parent = np.full(B, -1, np.int32)
    jtype = np.zeros(B, np.int32)
    jpos = np.zeros((B, 3))
    jquat = np.tile([0.0, 0, 0, 1.0], (B, 1))
    jaxis = np.tile([1.0, 0, 0], (B, 1))
    body_jdof = np.full(B, -1, np.int32)
    mass = np.zeros(B)
    com = np.zeros((B, 3))
    inertia = np.zeros((B, 3, 3))
    grav_mask = np.ones(B)

    coords: List[tuple] = []   # (body, kind, jdof)  kind: 0..5 base, 6 joint
    act_rows = []              # per dynamic actor: list of coord ids

    for ai, art in enumerate(scene.actors):
        bo = scene.body_offset[ai]
        do = scene.dof_offset[ai]
        static = art.fixed_base and art.ndof == 0
        for i in range(art.nbody):
            g = bo + i
            parent[g] = bo + art.parent[i] if art.parent[i] >= 0 else -1
            jtype[g] = art.jtype[i]
            jpos[g] = art.jpos[i]
            jquat[g] = art.jquat[i]
            jaxis[g] = art.jaxis[i]
            if art.dof_index[i] >= 0:
                body_jdof[g] = do + art.dof_index[i]
            mass[g] = art.mass[i]
            com[g] = art.com[i]
            inertia[g] = art.inertia[i]
            if art.disable_gravity or static:
                grav_mask[g] = 0.0
        row = []
        if not art.fixed_base:
            for k in range(6):
                row.append(len(coords))
                coords.append((bo, k, -1))
        # joint coords in dof order
        order = np.argsort(art.dof_index[art.dof_index >= 0])
        bodies_with_dof = [i for i in range(art.nbody) if art.dof_index[i] >= 0]
        bodies_sorted = sorted(bodies_with_dof, key=lambda i: art.dof_index[i])
        for i in bodies_sorted:
            row.append(len(coords))
            coords.append((bo + i, 6, do + art.dof_index[i]))
        if row:
            act_rows.append((ai, row, not art.fixed_base))

    NV = len(coords)
    dofc_body = np.array([c[0] for c in coords], np.int32) if NV else np.zeros(0, np.int32)
    dofc_kind = np.array([c[1] for c in coords], np.int32) if NV else np.zeros(0, np.int32)
    dofc_jdof = np.array([c[2] for c in coords], np.int32) if NV else np.zeros(0, np.int32)
    dofc_is_joint = dofc_kind == 6
    jd_coord = np.zeros(D, np.int32)
    for j, c in enumerate(coords):
        if c[2] >= 0:
            jd_coord[c[2]] = j
    base_S = np.zeros((NV, 6))
    for j in range(NV):
        if dofc_kind[j] < 6:
            base_S[j, dofc_kind[j]] = 1.0

    # body ancestry within actors
    anc_body = np.zeros((B, B), bool)
    for b in range(B):
        x = b
        while x >= 0:
            anc_body[b, x] = True   # x is ancestor-or-self of b
            x = parent[x]
    anc_dof = np.zeros((B, NV), _F32)
    subtree = np.zeros((NV, B), _F32)
    for j in range(NV):
        jb = dofc_body[j]
        same_actor = scene.body_actor == scene.body_actor[jb]
        desc = anc_body[:, jb] & same_actor      # bodies having jb as ancestor
        anc_dof[desc, j] = 1.0
        subtree[j, desc] = 1.0

    # depth for pointer doubling
    depth = np.zeros(B, np.int64)
    for b in range(B):
        x, d = b, 0
        while parent[x] >= 0:
            x = parent[x]
            d += 1
        depth[b] = d
    max_depth = int(depth.max()) if B else 0
    passes = max(1, int(np.ceil(np.log2(max_depth + 1)))) if max_depth > 0 else 0
    # precompute the pointer-doubling chains host-side: runtime-computed
    # indices would hit XLA's dynamic-gather slow path (they can't be
    # constant-folded through gathers)
    P0 = np.where(parent < 0, B, parent).astype(np.int32)
    P0 = np.concatenate([P0, np.asarray([B], np.int32)])
    parent_chain = []
    Pk = P0
    for _ in range(passes):
        parent_chain.append(Pk)
        Pk = Pk[Pk]

    # padded per-actor solve tables
    dyn = act_rows
    A_dyn = len(dyn)
    nv_max = max((len(r[1]) for r in dyn), default=1)
    act_coords = np.full((A_dyn, nv_max), NV, np.int32)
    act_pad = np.zeros((A_dyn, nv_max), _F32)
    act_anc = np.zeros((A_dyn, nv_max, nv_max), _F32)
    act_actor = np.zeros(A_dyn, np.int32)
    act_floating = np.zeros(A_dyn, bool)
    for r, (ai, row, floating) in enumerate(dyn):
        n = len(row)
        act_coords[r, :n] = row
        act_pad[r, :n] = 1.0
        act_actor[r] = ai
        act_floating[r] = floating
        for x in range(n):
            for y in range(n):
                jx, jy = row[x], row[y]
                bx, by = dofc_body[jx], dofc_body[jy]
                if anc_body[by, bx]:          # bx ancestor-or-self of by
                    if bx != by:
                        act_anc[r, x, y] = 1.0
                    else:
                        act_anc[r, x, y] = 1.0 if x <= y else 0.0

    # static pick/scatter matrices — all runtime index math becomes matmuls
    # with one-hot constants (dynamic gathers/scatters are a TPU slow path)
    A = scene.nactor
    base_pick = np.zeros((NV, A * 6), _F32)     # u_base = base_pick @ base6.flat
    joint_pick = np.zeros((NV, max(D, 1)), _F32)  # u_joint = joint_pick @ qd
    for j, (jb, kind, jd) in enumerate(coords):
        if kind < 6:
            base_pick[j, scene.body_actor[jb] * 6 + kind] = 1.0
        else:
            joint_pick[j, jd] = 1.0
    uscatter = np.zeros((NV, A_dyn * nv_max), _F32)  # u_new = uscatter @ u_new_a.flat
    for r in range(A_dyn):
        for x in range(nv_max):
            cidx = act_coords[r, x]
            if cidx < NV:
                uscatter[cidx, r * nv_max + x] = 1.0
    # clipped jdof for fk gather (no runtime clip)
    body_jdof_clipped = np.where(body_jdof >= 0, body_jdof, 0).astype(np.int32)

    # gripper force gate: finger dofs (by joint name) stop closing when their
    # link's net contact force exceeds scene.grip_force_gate. VELOCITY-drive
    # fingers only: the `target < 0` closing test is velocity semantics —
    # position targets are never negative, and gating effort-mode fingers
    # would zero the sustained squeeze an effort grasp depends on (the
    # reference applies no such gate in effort mode).
    from .model import DRIVE_VELOCITY as _DRV

    dof_gate_body = np.full(D, -1, np.int32)
    # effort-mode fingers: implicit motor-curve drive (see drive_terms_stacked).
    # A raw constant force on a 15 g finger slams it at the ±v_max clamp and
    # bang-bangs on contact — the closing pads then juggle/eject a caged block
    # (the omni_panda_pick 0/5 root cause, r5): two constant-force fingers give
    # the finger+block system an UNDAMPED free-translation mode along the
    # closing axis, and every re-contact injects energy. A real gripper motor
    # (and PhysX's drive+maxJointVelocity solve) delivers u at stall and
    # nothing at the velocity limit — implicitly: τ(qd⁺) = u − (|u|/v_max)·qd⁺,
    # which is ~30 N·s/m of drive-side damping for the Franka finger. Joint-
    # space damping is transport-safe (unlike contact-side damping, which
    # phantom-forces a swept grasp — the r4 slip bug).
    from .model import DRIVE_EFFORT as _DRE

    finger_motor = np.zeros(D, _F32)
    for ai, art in enumerate(scene.actors):
        for k, jn in enumerate(art.dof_names):
            if "finger" in jn and int(art.drive_mode[k]) == _DRE:
                finger_motor[scene.dof_offset[ai] + k] = 1.0
            if "finger" in jn and int(art.drive_mode[k]) == _DRV:
                for i in range(art.nbody):
                    if art.dof_index[i] == k:
                        dof_gate_body[scene.dof_offset[ai] + k] = scene.body_offset[ai] + i

    # actuated dof params stacked across actors
    def cat(field):
        vals = [getattr(a, field) for a in scene.actors]
        return np.concatenate(vals) if vals else np.zeros(0)

    return StackedModel(
        scene=scene,
        B=B, NV=NV, D=D,
        parent=parent,
        body_actor=np.asarray(scene.body_actor, np.int32),
        jtype=jtype, jpos=jpos, jquat=jquat, jaxis=jaxis,
        body_jdof=body_jdof,
        mass=mass, com=com, inertia=inertia, grav_mask=grav_mask,
        depth_passes=passes,
        parent_chain=parent_chain,
        dofc_body=dofc_body, dofc_is_joint=dofc_is_joint, dofc_jdof=dofc_jdof,
        jd_coord=jd_coord, base_S=base_S,
        anc_dof=anc_dof, subtree=subtree,
        A_dyn=A_dyn, nv_max=nv_max,
        act_coords=act_coords, act_pad=act_pad, act_anc=act_anc,
        act_actor=act_actor, act_floating=act_floating,
        dof_lower=cat("dof_lower"), dof_upper=cat("dof_upper"),
        dof_effort=cat("dof_effort"), dof_maxvel=cat("dof_maxvel"),
        dof_damping=cat("dof_damping"), dof_friction=cat("dof_friction"),
        dof_armature=cat("dof_armature"),
        drive_mode=cat("drive_mode").astype(np.int32),
        drive_kp=cat("drive_kp"), drive_kd=cat("drive_kd"),
        base_pick=base_pick, joint_pick=joint_pick, uscatter=uscatter,
        body_jdof_clipped=body_jdof_clipped,
        dof_gate_body=dof_gate_body,
        finger_motor=finger_motor,
    )


# ---------------------------------------------------------------------------
# FK: vectorized local transforms + pointer-doubling composition
# ---------------------------------------------------------------------------

def fk_stacked(m: StackedModel, root_pos, root_quat, q):
    """→ (body_pos (B,3), body_quat (B,4), axis_w (B,3))."""
    dt_ = jnp.float32
    B = m.B
    jq = jnp.asarray(m.jquat, dt_)
    jp = jnp.asarray(m.jpos, dt_)
    ax = jnp.asarray(m.jaxis, dt_)
    if m.D:
        qb = jnp.where(jnp.asarray(m.body_jdof >= 0), q[m.body_jdof_clipped], 0.0)
    else:
        qb = jnp.zeros(B, dt_)

    is_rev = jnp.asarray(m.jtype == JOINT_REVOLUTE)
    is_prism = jnp.asarray(m.jtype == JOINT_PRISMATIC)
    rotq = quat_from_axis_angle(ax, jnp.where(is_rev, qb, 0.0))
    L_quat = quat_mul(jq, rotq)
    L_pos = jp + jnp.where(
        is_prism[:, None], quat_rotate(jq, ax * qb[:, None]), 0.0
    )
    # roots: local transform IS the world root pose
    is_root = jnp.asarray(m.parent < 0)
    ba = m.body_actor  # static numpy index
    L_pos = jnp.where(is_root[:, None], root_pos[ba], L_pos)
    L_quat = jnp.where(is_root[:, None], root_quat[ba], L_quat)

    # pointer doubling with a virtual identity node at index B; the pointer
    # chains are STATIC numpy (precomputed at build) so every gather has
    # constant indices — dynamic-index gathers are a TPU slow path
    T_pos = jnp.concatenate([L_pos, jnp.zeros((1, 3), dt_)])
    T_quat = jnp.concatenate([L_quat, jnp.asarray([[0, 0, 0, 1]], dt_)])
    for Pk in m.parent_chain:
        pp = T_pos[Pk]
        pq = T_quat[Pk]
        T_pos = pp + quat_rotate(pq, T_pos)
        T_quat = quat_mul(pq, T_quat)
    body_pos = T_pos[:B]
    body_quat = quat_normalize(T_quat[:B])
    axis_w = quat_rotate(body_quat, ax)
    return body_pos, body_quat, axis_w


# ---------------------------------------------------------------------------
# dynamics pieces
# ---------------------------------------------------------------------------

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


def _crm(v, w):
    a, b = v[..., :3], v[..., 3:]
    c, d = w[..., :3], w[..., 3:]
    return jnp.concatenate([jnp.cross(a, c), jnp.cross(a, d) + jnp.cross(b, c)], -1)


def _crf(v, f):
    a, b = v[..., :3], v[..., 3:]
    n, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(a, n) + jnp.cross(b, ff), jnp.cross(a, ff)], -1)


def motion_subspace_stacked(m: StackedModel, body_pos, axis_w):
    """(NV,6) world-frame Plücker motion subspaces."""
    dt_ = body_pos.dtype
    a = axis_w[m.dofc_body]       # static numpy index gathers
    p = body_pos[m.dofc_body]
    is_rev = jnp.asarray(
        (m.jtype[m.dofc_body] == JOINT_REVOLUTE) & m.dofc_is_joint
    )
    is_prism = jnp.asarray(
        (m.jtype[m.dofc_body] == JOINT_PRISMATIC) & m.dofc_is_joint
    )
    S_rev = jnp.concatenate([a, jnp.cross(p, a)], -1)
    S_prism = jnp.concatenate([jnp.zeros_like(a), a], -1)
    S = jnp.asarray(m.base_S, dt_)
    S = jnp.where(is_rev[:, None], S_rev, S)
    S = jnp.where(is_prism[:, None], S_prism, S)
    return S


def generalized_velocities(m: StackedModel, state: SimState):
    """u (NV,) from root velocities (converted to Plücker) + qd — two static
    one-hot matmuls, no index ops."""
    w = state.root_angvel
    v_o = state.root_linvel - jnp.cross(w, state.root_pos)   # Plücker linear
    base6 = jnp.concatenate([w, v_o], -1)                     # (A,6)
    u = jnp.matmul(jnp.asarray(m.base_pick), base6.reshape(-1), precision=_PREC)
    if m.D:
        u = u + jnp.matmul(jnp.asarray(m.joint_pick), state.qd, precision=_PREC)
    return u


def spatial_inertias(m: StackedModel, body_pos, body_quat, mass_scale):
    dt_ = body_pos.dtype
    mass = jnp.asarray(m.mass, dt_) * mass_scale
    R = quat_to_matrix(body_quat)
    I_com = jnp.asarray(m.inertia, dt_) * mass_scale[:, None, None]
    c = body_pos + jnp.einsum("bij,bj->bi", R, jnp.asarray(m.com, dt_), precision=_PREC)
    Iw_rot = jnp.einsum("bij,bjk,blk->bil", R, I_com, R, precision=_PREC)
    C = _skew(c)
    mC = mass[:, None, None] * C
    top = jnp.concatenate([Iw_rot + jnp.einsum("bij,bkj->bik", mC, C, precision=_PREC), mC], -1)
    bot = jnp.concatenate(
        [jnp.swapaxes(mC, -1, -2), mass[:, None, None] * jnp.eye(3, dtype=dt_)], -1
    )
    return jnp.concatenate([top, bot], -2)   # (B,6,6)


def drive_terms_stacked(m: StackedModel, q, qd, dof_target, dt):
    dt_ = q.dtype
    mode = jnp.asarray(m.drive_mode)
    kp = jnp.asarray(m.drive_kp, dt_)
    kd = jnp.asarray(m.drive_kd, dt_)
    effort = jnp.asarray(m.dof_effort, dt_)

    # force-limited IMPLICIT velocity drive: an explicit clamped torque on a
    # low-inertia joint bang-bangs at ±max-velocity (τ flips sign every
    # substep); scaling the gain so the implicit torque respects the limit
    # keeps the drive unconditionally stable: kd_eff = min(kd, F/|Δv|)
    kd_eff = jnp.minimum(kd, effort / jnp.maximum(jnp.abs(dof_target - qd), 1e-6))
    vel_tau = kd_eff * dof_target
    vel_d = kd_eff

    kp_eff = jnp.minimum(kp, effort / jnp.maximum(jnp.abs(dof_target - q), 1e-6))
    pos_tau = kp_eff * (dof_target - q)
    pos_d = kp_eff * dt + kd

    eff_tau = jnp.clip(dof_target, -effort, effort)
    # effort-mode finger dofs (see build_stacked's finger_motor): motor-curve
    # damping |u|/v_max (force u at stall, →0 at the velocity limit) PLUS
    # load-proportional spindle stiction μ_s·|u| applied implicitly — a
    # Franka-style screw-driven finger resists back-driving in proportion to
    # its axial load. Without the stiction, two constant-force fingers + a
    # caged block form a free translation mode along the closing axis (the
    # drive forces cancel) and any sustained lateral load walks the grasp off
    # the pads (r5 omni lift slip). Velocity/position fingers need neither:
    # their drive damping is already the anchor.
    eff_d = kd + jnp.asarray(m.finger_motor, dt_) * jnp.abs(eff_tau) * (
        1.0 / jnp.maximum(jnp.asarray(m.dof_maxvel, dt_), 1e-6)
        + MU_SPINDLE / (jnp.abs(qd) + 0.02)
    )

    tau = jnp.where(
        mode == DRIVE_VELOCITY, vel_tau,
        jnp.where(mode == DRIVE_POSITION, pos_tau,
                  jnp.where(mode == DRIVE_EFFORT, eff_tau, 0.0)),
    )
    d_imp = jnp.where(
        mode == DRIVE_VELOCITY, vel_d,
        jnp.where(mode == DRIVE_POSITION, pos_d,
                  jnp.where(mode == DRIVE_EFFORT, eff_d, 0.0)),
    )
    d_imp = d_imp + jnp.asarray(m.dof_damping, dt_)
    # Coulomb joint friction, IMPLICIT: F = -f·qd⁺/(|qd|+v_eps) enters the
    # velocity solve as damping f/(|qd|+v_eps) — near-rest that is a ~f/v_eps
    # N·s/m anchor (true stiction behavior), and unlike the former explicit
    # -f·tanh(qd/v_eps) force it cannot destabilize a light link (a 15 g
    # finger with 2 N friction saw a 100 N·s/m EXPLICIT damper at rest, which
    # lagged grasp micro-adjustments and walked held blocks off the pads)
    d_imp = d_imp + jnp.asarray(m.dof_friction, dt_) / (jnp.abs(qd) + 0.02)
    # joint limits
    lo = jnp.asarray(m.dof_lower, dt_)
    hi = jnp.asarray(m.dof_upper, dt_)
    below = jnp.maximum(lo - q, 0.0)
    above = jnp.maximum(q - hi, 0.0)
    viol = (below > 0) | (above > 0)
    tau = tau + 1.0e3 * (below - above) - jnp.where(viol, 1.0e2 * qd, 0.0)
    return tau, d_imp


def stacked_substep(
    m: StackedModel,
    state: SimState,
    params: ModelParams,
    dt: float,
    contact_fn,
    tables=None,
    use_impulse: bool = True,
):
    """One semi-implicit substep for the whole scene. contact_fn(body_pos,
    body_quat, body_linvel, body_angvel, geom_friction) → (f_ext (B,6), net_cf)."""
    dt_ = jnp.float32
    scene = m.scene
    body_pos, body_quat, axis_w = fk_stacked(m, state.root_pos, state.root_quat, state.q)
    S = motion_subspace_stacked(m, body_pos, axis_w)
    u = generalized_velocities(m, state)

    anc = jnp.asarray(m.anc_dof, dt_)
    v_b = jnp.matmul(anc, S * u[:, None], precision=_PREC)                      # (B,6) Plücker
    w_b = v_b[:, :3]
    lin_b = v_b[:, 3:] + jnp.cross(w_b, body_pos)

    f_ext, net_cf, cgeom = contact_fn(body_pos, body_quat, lin_b, w_b, params.geom_friction)

    Iw = spatial_inertias(m, body_pos, body_quat, params.body_mass_scale)

    # bias: a = grav_freefall + anc @ crm(v_body(j), S_j u_j)
    g = jnp.asarray(scene.gravity, dt_)
    a0 = jnp.concatenate([jnp.zeros(3, dt_), -g])
    vj = v_b[m.dofc_body]                             # (NV,6) static gather
    cterm = _crm(vj, S * u[:, None])                  # (NV,6)
    a_b = jnp.asarray(m.grav_mask, dt_)[:, None] * a0[None, :] + jnp.matmul(anc, cterm, precision=_PREC)
    Iv = jnp.einsum("bij,bj->bi", Iw, v_b, precision=_PREC)
    f_net = jnp.einsum("bij,bj->bi", Iw, a_b, precision=_PREC) + _crf(v_b, Iv) - f_ext
    sub = jnp.asarray(m.subtree, dt_)
    C = jnp.einsum("vi,vi->v", S, jnp.matmul(sub, f_net, precision=_PREC), precision=_PREC)  # (NV,)

    # composite inertias at dof bodies → F = Ic S
    Ic = jnp.einsum("vb,bij->vij", sub, Iw, precision=_PREC)  # (NV,6,6)
    F = jnp.einsum("vij,vj->vi", Ic, S, precision=_PREC)  # (NV,6)

    # drives on actuated dofs, scattered to coords. Gripper force gate: a
    # finger dof closing (target < 0) against contact stops (target → 0)
    dof_target = state.dof_target
    if m.D and (m.dof_gate_body >= 0).any():
        gb = np.where(m.dof_gate_body >= 0)[0]
        bodies = m.dof_gate_body[gb]
        fmag = jnp.linalg.norm(state.net_contact_force[bodies], axis=-1)
        gated = (fmag > scene.grip_force_gate) & (dof_target[gb] < 0.0)
        dof_target = dof_target.at[gb].set(
            jnp.where(gated, 0.0, dof_target[gb])
        )
    tau_j, d_imp_j = drive_terms_stacked(m, state.q, state.qd, dof_target, dt)
    if m.D:
        jpick = jnp.asarray(m.joint_pick)
        tau = jnp.matmul(jpick, tau_j, precision=_PREC)
        d_imp = jnp.matmul(jpick, d_imp_j + jnp.asarray(m.dof_armature, dt_), precision=_PREC)
    else:
        tau = jnp.zeros(m.NV, dt_)
        d_imp = jnp.zeros(m.NV, dt_)

    # per-actor padded blocks
    Sz = jnp.concatenate([S, jnp.zeros((1, 6), dt_)])
    Fz = jnp.concatenate([F, jnp.zeros((1, 6), dt_)])
    uz = jnp.concatenate([u, jnp.zeros(1, dt_)])
    tz = jnp.concatenate([tau, jnp.zeros(1, dt_)])
    Cz = jnp.concatenate([C, jnp.zeros(1, dt_)])
    dz = jnp.concatenate([d_imp, jnp.zeros(1, dt_)])
    ac = m.act_coords                                 # static numpy (A,nv)
    Sa = Sz[ac]                                       # (A,nv,6)
    Fa = Fz[ac]
    Mfull = jnp.einsum("ani,ami->anm", Sa, Fa, precision=_PREC)  # (A,nv,nv): S_x · F_y
    mask = jnp.asarray(m.act_anc, dt_)
    eye = jnp.eye(m.nv_max, dtype=dt_)
    Mm = Mfull * mask                                  # ancestor(-or-self) half
    M0 = Mm + jnp.swapaxes(Mm, -1, -2) - Mm * eye      # symmetric mass matrix
    pad = jnp.asarray(m.act_pad, dt_)

    ua = uz[ac] * pad
    rhs = jnp.einsum("anm,am->an", M0, ua, precision=_PREC) + dt * (tz[ac] - Cz[ac]) * pad
    # implicit drive damping + padding identity on the solve matrix only
    M = M0 + eye[None] * (dt * dz[ac] + (1.0 - pad) + 1e-8)[..., None, :]
    from .linalg import solve_psd

    # ---- IMPLICIT couple-contact terms (articulated↔free, i.e. grasping) ----
    # The articulated side of a couple contact gets no explicit penalty force
    # (see contact.compute_contact_forces): an explicit stiff spring-damper on
    # a light finger link explodes. Instead the contact enters the velocity
    # solve implicitly (Baraff):
    #   fn(u⁺) = kn·d − (kd + dt·kn)·vn(u⁺),  vn = e·J u⁺ − e·v_other·n
    #   τ(u⁺)  = Jᵀ(e·kn·d + (kd+κ)·v_other·n) − (kd+κ)·JᵀJ·u⁺,  κ = dt·kn
    # → M += dt(kd+κ)·JᵀJ (SPD-preserving), rhs += dt·Jᵀ(e·kn·d + (kd+κ)v_oth_n).
    cpl_groups = []
    if tables is not None and cgeom is not None and len(tables.art_bodies):
        tau_c = max(2.0 * dt, 1e-3)
        point_all = cgeom["point"]
        n_all = cgeom["normal"]
        depth_all = jnp.minimum(cgeom["depth"], jnp.asarray(scene.max_contact_depth, dt_))
        ba_all = scene.geom_body[tables.con_geom_a]
        fbidx = np.where(tables.con_geom_b >= 0, tables.con_geom_b, tables.con_geom_a)
        bb_all = scene.geom_body[fbidx]
        for b in tables.art_bodies:
            Ca = np.where((tables.a_art > 0) & (ba_all == b))[0]
            Cb = np.where((tables.b_art > 0) & (bb_all == b))[0]
            C = np.concatenate([Ca, Cb]).astype(np.int64)
            if not len(C):
                continue
            e = np.concatenate([np.ones(len(Ca)), -np.ones(len(Cb))]).astype(np.float32)
            other = np.concatenate([bb_all[Ca], ba_all[Cb]]).astype(np.int64)
            ai_b = int(m.body_actor[b])
            r = int(np.where(m.act_actor == ai_b)[0][0])
            anc_pad = np.concatenate([m.anc_dof[b], [0.0]])[m.act_coords[r]]
            Phi = Sz[m.act_coords[r]] * jnp.asarray(anc_pad, dt_)[:, None]   # (nv,6)
            p_c = point_all[C]
            n_c = n_all[C]
            d_c = depth_all[C]
            act_c = (cgeom["depth"][C] > 0.0).astype(dt_)
            X = jnp.concatenate([jnp.cross(p_c, n_c), n_c], -1)              # (nc,6)
            J = jnp.einsum("ci,vi->cv", X, Phi, precision=_PREC)             # (nc,nv)
            kn_c = jnp.asarray(tables.kn_base[C] / (tau_c * tau_c), dt_)
            kd_c = jnp.asarray(2.0 * tables.kn_base[C] / tau_c, dt_)
            # DAMPER cap at the free side's momentum-transfer scale: the raw
            # kd (≈400 N·s/m at pick scales) treats the free body as an
            # infinite-mass boundary, so a transient pad↔block approach of
            # ~0.5 m/s (sweep onset) produced ~200 N phantom forces that pried
            # fingers open and flung grasps (r4 transport slip). A free body of
            # mass m can absorb at most ~m·|v_rel|/dt of damping force, so
            # kd_eff ≤ β·m_oth/(dt·n_pts). The implicit-SPRING term κ = dt·kn
            # stays uncapped — it carries the stall force and the
            # unconditional stability of the solve.
            m_oth_s = jnp.asarray(m.mass[other], dt_) * params.body_mass_scale[other]
            kd_cap = DAMP_CAP_BETA * m_oth_s / (dt * jnp.asarray(tables.n_pts[C], dt_))
            kd_c = jnp.minimum(kd_c, kd_cap)
            kap = dt * kn_c
            v_oth = lin_b[other] + jnp.cross(w_b[other], p_c - body_pos[other])
            v_oth_n = jnp.sum(v_oth * n_c, -1)
            e_j = jnp.asarray(e, dt_)
            coefM = dt * (kd_c + kap) * act_c
            coefR = dt * (e_j * kn_c * jnp.maximum(d_c, 0.0) + (kd_c + kap) * v_oth_n) * act_c
            M = M.at[r].add(jnp.einsum("c,cv,cw->vw", coefM, J, J, precision=_PREC))
            rhs = rhs.at[r].add(jnp.einsum("c,cv->v", coefR, J, precision=_PREC))
            cpl_groups.append(dict(b=b, r=r, C=C, e=e_j, J=J, kn=kn_c, kd=kd_c,
                                   kap=kap, d=d_c, act=act_c, n=n_c,
                                   v_oth_n=v_oth_n, Phi=Phi))

    u_new_a = solve_psd(M, rhs) * pad                             # (A,nv)

    # post-solve implicit contact forces: seed the impulse friction cones (a
    # pinched light body otherwise only sees impulse-scale caps and squirts
    # out of grasps) and expose the grip force on the arm's net_cf (gate).
    if cpl_groups:
        fn_seed = cgeom["fn_stiff"]
        for g in cpl_groups:
            vn_plus = g["e"] * (
                jnp.einsum("cv,v->c", g["J"], u_new_a[g["r"]], precision=_PREC)
                - g["v_oth_n"]
            )
            fn_star = jnp.maximum(
                g["kn"] * jnp.maximum(g["d"], 0.0) - (g["kd"] + g["kap"]) * vn_plus,
                0.0,
            ) * g["act"]
            fn_seed = fn_seed.at[g["C"]].set(fn_star)
            net_cf = net_cf.at[g["b"]].add(
                jnp.sum((g["e"] * fn_star)[:, None] * g["n"], axis=0)
            )
            g["fn_star"] = fn_star
        cgeom = dict(cgeom)
        cgeom["fn_stiff"] = fn_seed

    # ---- velocity-impulse contact resolution (free bodies + TWO-WAY
    # articulated coupling, contact.impulse_contact_pass). Runs on POST-solve
    # velocities for every body; articulated links participate through their
    # joint-space effective mass Ψ_b = Φ_b M⁻¹ Φ_bᵀ (same damped M as the
    # velocity solve), and the accumulated spatial impulses fold back into the
    # generalized velocities as ΔU = M⁻¹ Φᵀ Y before integration.
    from .contact import _free_body_mask, impulse_contact_pass

    free_rows = _free_body_mask(scene)
    run_impulse = (
        use_impulse and tables is not None and cgeom is not None
        and (free_rows.any() or tables.a_sta.any() or tables.b_sta.any())
    )
    lin2 = ang2 = None
    if run_impulse:
        u_post = jnp.matmul(jnp.asarray(m.uscatter), u_new_a.reshape(-1), precision=_PREC)
        v_post = jnp.matmul(anc, S * u_post[:, None], precision=_PREC)     # (B,6)
        w_post = v_post[:, :3]
        lin_post = v_post[:, 3:] + jnp.cross(w_post, body_pos)

        art_bodies = list(tables.art_bodies)
        psi = None
        phi_by_body = {}
        if art_bodies:
            psi = jnp.zeros((m.B, 6, 6), dt_)
            from .linalg import solve_psd_multi

            for b in art_bodies:
                ai_b = int(m.body_actor[b])
                r = int(np.where(m.act_actor == ai_b)[0][0])
                # Φ_b (nv,6): rows S_j for coords j ancestor-or-self of b
                anc_pad = np.concatenate([m.anc_dof[b], [0.0]])[m.act_coords[r]]
                Phi = Sz[m.act_coords[r]] * jnp.asarray(anc_pad, dt_)[:, None]
                X = solve_psd_multi(M[..., r, :, :], Phi)          # (nv,6)
                psi_b = jnp.einsum("vi,vj->ij", Phi, X, precision=_PREC)
                psi = psi.at[b].set(psi_b)
                phi_by_body[b] = (r, Phi)

        art_apply = None
        if art_bodies:
            phi_list = [(b, phi_by_body[b]) for b in art_bodies]

            def art_apply(Y_iter):
                """Exact generalized response: ΔU = M⁻¹ΦᵀY → body ΔV (B,6)."""
                rhsY = jnp.zeros((m.A_dyn, m.nv_max), dt_)
                for b2, (r2, Phi2) in phi_list:
                    rhsY = rhsY.at[r2].add(
                        jnp.einsum("vi,i->v", Phi2, Y_iter[b2], precision=_PREC)
                    )
                duY = solve_psd(M, rhsY) * pad
                uY = jnp.matmul(
                    jnp.asarray(m.uscatter), duY.reshape(-1), precision=_PREC
                )
                return jnp.matmul(anc, S * uY[:, None], precision=_PREC)

        cache_ok = (
            state.contact_lam is not None
            and state.contact_lam.shape[-2:] == (tables.n_con, 4)
        )
        lam_warm = state.contact_lam if cache_ok else None
        lin2, ang2, ncf_imp, Y_tot, lam_out = impulse_contact_pass(
            scene, tables, cgeom,
            body_pos, body_quat, lin_post, w_post,
            params.body_mass_scale, dt, psi=psi, art_apply=art_apply,
            lam_warm=lam_warm,
        )
        net_cf = net_cf + ncf_imp

        if art_bodies:
            rhs2 = jnp.zeros((m.A_dyn, m.nv_max), dt_)
            for b, (r, Phi) in phi_by_body.items():
                rhs2 = rhs2.at[r].add(
                    jnp.einsum("vi,i->v", Phi, Y_tot[b], precision=_PREC)
                )
            du = solve_psd(M, rhs2) * pad
            u_new_a = u_new_a + du

    # scatter back to (NV,) via static one-hot matmul
    u_new = jnp.matmul(jnp.asarray(m.uscatter), u_new_a.reshape(-1), precision=_PREC)

    # integrate joints
    q = state.q
    qd = state.qd
    if m.D:
        qd_new = u_new[m.jd_coord]
        maxvel = jnp.asarray(m.dof_maxvel, dt_)
        qd_new = jnp.clip(qd_new, -maxvel, maxvel)
        q_new = q + dt * qd_new
        q_new = jnp.clip(
            q_new,
            jnp.asarray(m.dof_lower, dt_) - 1e-3,
            jnp.asarray(m.dof_upper, dt_) + 1e-3,
        )
    else:
        q_new, qd_new = q, qd

    # integrate floating roots
    root_pos = state.root_pos
    root_quat = state.root_quat
    root_linvel = state.root_linvel
    root_angvel = state.root_angvel
    floats = [r for r in range(m.A_dyn) if m.act_floating[r]]
    if floats:
        fr = np.asarray(floats)
        ai = m.act_actor[fr]
        base6 = u_new_a[fr, :6]                       # (nf,6) [ω, v_O]
        w_new = base6[:, :3]
        v_o = base6[:, 3:]
        p_r = root_pos[ai]
        v_r = v_o + jnp.cross(w_new, p_r)
        # stability caps: a near-massless body in a stiff pinch can otherwise
        # reach f32-overflow velocities (NaN cascade); PhysX clamps likewise
        w_new = jnp.clip(w_new, -scene.max_root_angvel, scene.max_root_angvel)
        v_r = jnp.clip(v_r, -scene.max_root_linvel, scene.max_root_linvel)
        root_linvel = root_linvel.at[ai].set(v_r)
        root_angvel = root_angvel.at[ai].set(w_new)

        if run_impulse:
            # free single rigid bodies take their impulse-corrected velocities
            rows = np.where(free_rows > 0)[0]
            if len(rows):
                b_act = scene.body_actor[rows]
                root_linvel = root_linvel.at[b_act].set(lin2[rows])
                root_angvel = root_angvel.at[b_act].set(ang2[rows])
            v_r2 = root_linvel[ai]
            w_new2 = root_angvel[ai]
        else:
            v_r2, w_new2 = v_r, w_new
        root_pos = root_pos.at[ai].set(p_r + dt * v_r2)
        root_quat = root_quat.at[ai].set(quat_integrate(root_quat[ai], w_new2, dt))

    new_cache = state.contact_lam
    if run_impulse and cache_ok:
        new_cache = lam_out
    return state._replace(
        root_pos=root_pos,
        root_quat=root_quat,
        root_linvel=root_linvel,
        root_angvel=root_angvel,
        q=q_new,
        qd=qd_new,
        net_contact_force=net_cf,
        contact_lam=new_cache,
    )


def refresh_stacked(m: StackedModel, state: SimState) -> SimState:
    body_pos, body_quat, axis_w = fk_stacked(m, state.root_pos, state.root_quat, state.q)
    S = motion_subspace_stacked(m, body_pos, axis_w)
    u = generalized_velocities(m, state)
    v_b = jnp.matmul(jnp.asarray(m.anc_dof, jnp.float32), S * u[:, None], precision=_PREC)
    w_b = v_b[:, :3]
    lin_b = v_b[:, 3:] + jnp.cross(w_b, body_pos)
    return state._replace(
        body_pos=body_pos, body_quat=body_quat, body_linvel=lin_b, body_angvel=w_b
    )
