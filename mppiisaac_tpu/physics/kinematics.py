"""Forward kinematics (single env; batch via vmap).

Tree loops unroll at trace time — articulations are small (≤ ~20 links), so XLA
sees a static chain of fused (K,·)-batched elementwise ops after vmap.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math3d import quat_from_axis_angle, quat_mul, quat_rotate
from .model import JOINT_PRISMATIC, JOINT_REVOLUTE, Articulation


def fk_actor(art: Articulation, root_pos, root_quat, root_linvel, root_angvel, q, qd):
    """World-frame pose + velocity of every link of one articulation.

    q, qd: (ndof,) for this actor. Returns (pos (nb,3), quat (nb,4),
    linvel (nb,3), angvel (nb,3)); linvel is the velocity of each link-frame
    origin (matching the reference's rigid-body-state layout).
    """
    pos = [root_pos]
    quat = [root_quat]
    linvel = [root_linvel]
    angvel = [root_angvel]
    for i in range(1, art.nbody):
        p = int(art.parent[i])
        jp = jnp.asarray(art.jpos[i], dtype=root_pos.dtype)
        jq = jnp.asarray(art.jquat[i], dtype=root_pos.dtype)
        axis = jnp.asarray(art.jaxis[i], dtype=root_pos.dtype)
        # joint frame on parent
        fp = pos[p] + quat_rotate(quat[p], jp)
        fq = quat_mul(quat[p], jq)
        # velocity of the joint-frame origin (rigid with parent)
        v_f = linvel[p] + jnp.cross(angvel[p], fp - pos[p])
        w_f = angvel[p]
        jt = int(art.jtype[i])
        k = int(art.dof_index[i])
        if jt == JOINT_REVOLUTE:
            qi, qdi = q[k], qd[k]
            jrot = quat_from_axis_angle(axis, qi)
            bq = quat_mul(fq, jrot)
            bp = fp
            axis_w = quat_rotate(fq, axis)
            bw = w_f + axis_w * qdi
            bv = v_f
        elif jt == JOINT_PRISMATIC:
            qi, qdi = q[k], qd[k]
            axis_w = quat_rotate(fq, axis)
            bp = fp + axis_w * qi
            bq = fq
            bw = w_f
            # origin offset rotates with the parent too
            bv = v_f + jnp.cross(w_f, bp - fp) + axis_w * qdi
        else:  # fixed
            bp, bq, bw, bv = fp, fq, w_f, v_f
        pos.append(bp)
        quat.append(bq)
        linvel.append(bv)
        angvel.append(bw)
    return (
        jnp.stack(pos),
        jnp.stack(quat),
        jnp.stack(linvel),
        jnp.stack(angvel),
    )


def joint_world_frames(art: Articulation, pos, quat):
    """World positions of each body's inboard joint anchor and world joint axes.

    Needed by dynamics for motion subspaces. Returns (anchor (nb,3), axis_w (nb,3)).
    For the root body, anchor = root pos, axis arbitrary.
    """
    anchors = [pos[0]]
    axes = [jnp.array([1.0, 0.0, 0.0], dtype=pos.dtype)]
    for i in range(1, art.nbody):
        p = int(art.parent[i])
        jp = jnp.asarray(art.jpos[i], dtype=pos.dtype)
        jq = jnp.asarray(art.jquat[i], dtype=pos.dtype)
        axis = jnp.asarray(art.jaxis[i], dtype=pos.dtype)
        jt = int(art.jtype[i])
        if jt == JOINT_PRISMATIC:
            # anchor equals child origin; axis in world = parent_rot * jq * axis
            anchors.append(pos[i])
        else:
            anchors.append(pos[i])  # revolute: joint anchor == child origin
        fq = quat_mul(quat[p], jq)
        axes.append(quat_rotate(fq, axis))
    return jnp.stack(anchors), jnp.stack(axes)
