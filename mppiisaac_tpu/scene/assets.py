"""Asset utilities: mesh → primitive fitting for user URDFs.

The reference loads ~420 mesh assets through Isaac Gym's C++ importer
(`isaacgym_utils.py:14-58`); our contact engine consumes primitives, so mesh
collision elements are reduced to a bounding capsule/box by the native fitter
(csrc/meshfit.cpp). Wire `mesh_fit` into `parse_urdf(source, mesh_fit=...)`.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..physics.urdf import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, UrdfGeom
from ..ops import native


def mesh_fit(path: str, scale, origin_pos, origin_quat) -> Optional[UrdfGeom]:
    """URDF mesh collision element → primitive UrdfGeom (or None)."""
    fit = native.meshfit(path, tuple(np.asarray(scale, dtype=np.float64)))
    if fit is None:
        return None
    # compose the mesh-frame primitive pose with the collision origin
    from ..physics.math3d import quat_mul, quat_rotate
    import jax.numpy as jnp

    oq = jnp.asarray(origin_quat, jnp.float32)
    p = np.asarray(origin_pos) + np.asarray(
        quat_rotate(oq, jnp.asarray(fit["pos"], jnp.float32))
    )
    q = np.asarray(quat_mul(oq, jnp.asarray(fit["quat"], jnp.float32)))
    if fit["kind"] == 2:
        return UrdfGeom(GEOM_CAPSULE, np.array([fit["params"][0], fit["params"][1], 0.0]), p, q)
    if fit["kind"] == 0:
        # sphere (wheels' rolling contact and quadruped feet must NOT become
        # boxes — corners catch the ground)
        return UrdfGeom(GEOM_SPHERE, np.array([fit["params"][0], 0.0, 0.0]), p, q)
    return UrdfGeom(GEOM_BOX, np.asarray(fit["params"]), p, q)


def load_urdf_file(path: str):
    """Parse a user URDF file with mesh fitting enabled."""
    from ..physics.urdf import parse_urdf

    return parse_urdf(path, mesh_fit=mesh_fit)
