"""The simulator step: pure function (SimState, ModelParams) → SimState.

Parity surface: reference `IsaacGymWrapper.step` (`isaacgym_wrapper.py:639-655`)
— simulate + "refresh" of root/dof/rigid-body/contact tensors — except here the
refreshed tensors are just fields of the returned pytree. Batch over K samples
with `jax.vmap(engine.step)`; save/restore = keep/pass the pytree
(supersedes `save_root_state`/`reset_rollout_sim`, `mppi_isaac.py:87-105`).

The compute path is the stacked whole-scene formulation (physics/stacked.py):
fixed op count per substep regardless of scene size.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .contact import build_contact_tables, compute_contact_forces
from .scene_model import SceneModel
from .stacked import build_stacked, refresh_stacked, stacked_substep
from .types import ModelParams, SimState


class Engine:
    """Holds static scene data. All methods are pure functions of their inputs."""

    def __init__(self, scene: SceneModel, use_impulse: bool = True):
        # use_impulse: layer the free-body impulse pass over the penalty model
        # (world-fidelity). The fused Pallas rollout uses the penalty-only
        # model; set False to get an engine matching it exactly (tests).
        self.use_impulse = use_impulse
        self.scene = scene
        self.stacked = build_stacked(scene)
        self.tables = build_contact_tables(scene)
        # effective substep count: refine until the substep dt is small enough
        # for the compliant contact model (≤ ~12.5 ms), preserving the
        # reference's configured dt/substeps semantics otherwise
        has_contacts = (
            len(self.tables.cp_geom) or len(self.tables.bp_geom)
            or len(self.tables.cc_a) or len(self.tables.cb_cap)
            or len(self.tables.bb_a) or len(self.tables.bbc_a)
        )
        n = scene.substeps
        while has_contacts and scene.dt / n > 0.0126:
            n += 1
        self.substeps = n
        self.dt_sub = scene.dt / n

    # ------------------------------------------------------------------
    def default_params(self) -> ModelParams:
        return ModelParams(
            body_mass_scale=jnp.ones(self.scene.nbody, jnp.float32),
            geom_friction=jnp.ones(self.scene.ngeom, jnp.float32),
        )

    def initial_state(self) -> SimState:
        s = self.scene
        return SimState(
            root_pos=jnp.zeros((s.nactor, 3), jnp.float32),
            root_quat=jnp.tile(jnp.array([0, 0, 0, 1], jnp.float32), (s.nactor, 1)),
            root_linvel=jnp.zeros((s.nactor, 3), jnp.float32),
            root_angvel=jnp.zeros((s.nactor, 3), jnp.float32),
            q=jnp.zeros((s.ndof,), jnp.float32),
            qd=jnp.zeros((s.ndof,), jnp.float32),
            dof_target=jnp.zeros((s.ndof,), jnp.float32),
            body_pos=jnp.zeros((s.nbody, 3), jnp.float32),
            body_quat=jnp.tile(jnp.array([0, 0, 0, 1], jnp.float32), (s.nbody, 1)),
            body_linvel=jnp.zeros((s.nbody, 3), jnp.float32),
            body_angvel=jnp.zeros((s.nbody, 3), jnp.float32),
            net_contact_force=jnp.zeros((s.nbody, 3), jnp.float32),
            contact_lam=jnp.zeros((self.tables.n_con, 4), jnp.float32),
        )

    # ------------------------------------------------------------------
    def _contact_fn(self, dt_sub):
        scene, tables = self.scene, self.tables

        def fn(body_pos, body_quat, body_linvel, body_angvel, geom_friction):
            return compute_contact_forces(
                scene, tables, body_pos, body_quat, body_linvel, body_angvel,
                geom_friction, dt_sub,
            )

        return fn

    def refresh(self, state: SimState) -> SimState:
        """Recompute derived body caches without stepping (the reference's
        refresh_* after set_*_tensor)."""
        return refresh_stacked(self.stacked, state)

    def step(self, state: SimState, params: Optional[ModelParams] = None) -> SimState:
        """Advance one control dt (all substeps) and refresh caches."""
        if params is None:
            params = self.default_params()
        contact_fn = self._contact_fn(self.dt_sub)

        def body(st, _):
            return (
                stacked_substep(
                    self.stacked, st, params, self.dt_sub, contact_fn,
                    self.tables, use_impulse=self.use_impulse,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=self.substeps)
        return self.refresh(state)
