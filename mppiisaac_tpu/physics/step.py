"""The simulator step: pure function (SimState, ModelParams) → SimState.

Parity surface: reference `IsaacGymWrapper.step` (`isaacgym_wrapper.py:639-655`)
— simulate + "refresh" of root/dof/rigid-body/contact tensors — except here the
refreshed tensors are just fields of the returned pytree. Batch over K samples
with `jax.vmap(engine.step)`; save/restore = keep/pass the pytree
(supersedes `save_root_state`/`reset_rollout_sim`, `mppi_isaac.py:87-105`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .contact import ContactTables, build_contact_tables, compute_contact_forces
from .dynamics import ActorMasks, DynInputs, build_actor_masks, solve_velocity_update
from .kinematics import fk_actor, joint_world_frames
from .math3d import quat_integrate, quat_normalize
from .scene_model import SceneModel
from .types import ModelParams, SimState


class Engine:
    """Holds static scene data + compiled-step helpers. Stateless w.r.t. sim
    state — all methods are pure functions of their inputs."""

    def __init__(self, scene: SceneModel):
        self.scene = scene
        self.masks = [build_actor_masks(a) for a in scene.actors]
        self.tables = build_contact_tables(scene)
        # effective substep count: refine until the substep dt is small enough
        # for the compliant contact model (≤ ~12.5 ms), preserving the
        # reference's configured dt/substeps semantics otherwise
        n = scene.substeps
        while scene.dt / n > 0.0126 and (len(self.tables.cp_geom) or len(self.tables.bp_geom)
                                         or len(self.tables.cc_a) or len(self.tables.cb_cap)
                                         or len(self.tables.bb_a)):
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
        """Zeroed state with actors at their model-default poses is built by
        scene.builder (which knows init poses); this gives the right shapes."""
        s = self.scene
        st = SimState(
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
        )
        return st

    # ------------------------------------------------------------------
    def _fk_all(self, state: SimState):
        """FK for every actor → stacked body arrays + per-actor DynInputs."""
        s = self.scene
        pos_l, quat_l, lv_l, av_l, dins = [], [], [], [], []
        for ai, art in enumerate(s.actors):
            dsl = slice(s.dof_offset[ai], s.dof_offset[ai] + art.ndof)
            p, q, lv, av = fk_actor(
                art,
                state.root_pos[ai],
                state.root_quat[ai],
                state.root_linvel[ai],
                state.root_angvel[ai],
                state.q[dsl],
                state.qd[dsl],
            )
            anchors, axes = joint_world_frames(art, p, q)
            dins.append(DynInputs(pos=p, quat=q, linvel=lv, angvel=av, anchors=anchors, axes=axes))
            pos_l.append(p); quat_l.append(q); lv_l.append(lv); av_l.append(av)
        return (
            jnp.concatenate(pos_l),
            jnp.concatenate(quat_l),
            jnp.concatenate(lv_l),
            jnp.concatenate(av_l),
            dins,
        )

    def refresh(self, state: SimState) -> SimState:
        """Recompute derived body caches without stepping (the reference's
        refresh_* after set_*_tensor)."""
        bp, bq, blv, bav, _ = self._fk_all(state)
        return state._replace(body_pos=bp, body_quat=bq, body_linvel=blv, body_angvel=bav)

    # ------------------------------------------------------------------
    def _substep(self, state: SimState, params: ModelParams, dt: float) -> SimState:
        s = self.scene
        bp, bq, blv, bav, dins = self._fk_all(state)
        f_ext, net_cf = compute_contact_forces(
            s, self.tables, bp, bq, blv, bav, params.geom_friction, dt
        )

        root_pos = state.root_pos
        root_quat = state.root_quat
        root_linvel = state.root_linvel
        root_angvel = state.root_angvel
        q = state.q
        qd = state.qd

        for ai, art in enumerate(s.actors):
            if art.fixed_base and art.ndof == 0:
                continue  # static scenery: nothing to integrate
            m = self.masks[ai]
            bsl = slice(s.body_offset[ai], s.body_offset[ai] + art.nbody)
            dsl = slice(s.dof_offset[ai], s.dof_offset[ai] + art.ndof)
            u_new = solve_velocity_update(
                art,
                m,
                dins[ai],
                q[dsl],
                qd[dsl],
                state.dof_target[dsl],
                f_ext[bsl],
                s.gravity,
                dt,
                mass_scale=params.body_mass_scale[bsl],
            )
            if not art.fixed_base:
                w_new = u_new[:3]
                v_o = u_new[3:6]
                p_r = root_pos[ai]
                v_r = v_o + jnp.cross(w_new, p_r)
                root_pos = root_pos.at[ai].set(p_r + dt * v_r)
                root_quat = root_quat.at[ai].set(
                    quat_integrate(root_quat[ai], w_new, dt)
                )
                root_linvel = root_linvel.at[ai].set(v_r)
                root_angvel = root_angvel.at[ai].set(w_new)
            if art.ndof:
                qd_new = u_new[m.base_dofs:]
                q_new = q[dsl] + dt * qd_new
                lo = jnp.asarray(art.dof_lower, q.dtype) - 1e-3
                hi = jnp.asarray(art.dof_upper, q.dtype) + 1e-3
                q_new = jnp.clip(q_new, lo, hi)
                q = q.at[dsl].set(q_new)
                qd = qd.at[dsl].set(qd_new)

        return state._replace(
            root_pos=root_pos,
            root_quat=root_quat,
            root_linvel=root_linvel,
            root_angvel=root_angvel,
            q=q,
            qd=qd,
            net_contact_force=net_cf,
        )

    def step(self, state: SimState, params: Optional[ModelParams] = None) -> SimState:
        """Advance one control dt (all substeps) and refresh caches."""
        if params is None:
            params = self.default_params()
        dt = self.dt_sub

        def body(st, _):
            return self._substep(st, params, dt), None

        state, _ = jax.lax.scan(body, state, None, length=self.substeps)
        return self.refresh(state)
