"""Pytree state types for the simulator.

The reference exposes exactly four state tensors through gymtorch views
(`/root/reference` `isaacgym_wrapper.py:186-199`): actor root state ``(A,13)``,
DOF state ``(D,2)``, rigid-body state ``(B,13)`` and net contact force
``(B,3)``. Here those are fields of one immutable pytree: "acquire / refresh /
set_*_tensor / save / restore" all collapse into passing the pytree around.
State save/restore is therefore bit-exact (the reference cannot restore
rigid-body state at all — `mppi_isaac.py:101-105`).

All arrays are per-env; a K-sample batch is the same pytree with a leading K
axis (created by ``vmap`` / broadcast).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SimState(NamedTuple):
    # --- integrated state ---
    root_pos: jnp.ndarray        # (A,3)
    root_quat: jnp.ndarray       # (A,4) xyzw
    root_linvel: jnp.ndarray     # (A,3) world-frame velocity of the root link origin
    root_angvel: jnp.ndarray     # (A,3) world frame
    q: jnp.ndarray               # (D,)
    qd: jnp.ndarray              # (D,)
    # --- command state (set by apply_*_cmd, consumed by step) ---
    dof_target: jnp.ndarray      # (D,) velocity target / position target / effort
    # --- derived caches (refreshed by step / refresh_state) ---
    body_pos: jnp.ndarray        # (B,3)
    body_quat: jnp.ndarray       # (B,4)
    body_linvel: jnp.ndarray     # (B,3)
    body_angvel: jnp.ndarray     # (B,3)
    net_contact_force: jnp.ndarray  # (B,3) world-frame net contact force per body
    # persistent-contact impulse cache (n_con,4): [λ_n, λ_t(3)] per static
    # contact candidate, warm-starting the velocity-impulse pass next substep
    # (PhysX-style persistent contacts). Candidates are a STATIC table, so a
    # cache row always refers to the same geometric pair; stale rows are gated
    # by the current activity mask. Zeros = cold start; None = caching off
    # (engines allocate real zeros in initial_state).
    contact_lam: jnp.ndarray = None

    # ------------------------------------------------------------------
    # Reference-layout views
    # ------------------------------------------------------------------
    @property
    def root_state(self) -> jnp.ndarray:
        """(...,A,13) = pos + quat_xyzw + linvel + angvel (Isaac layout)."""
        return jnp.concatenate(
            [self.root_pos, self.root_quat, self.root_linvel, self.root_angvel],
            axis=-1,
        )

    @property
    def dof_state(self) -> jnp.ndarray:
        """(...,D,2) interleaved (q, qd) per DOF (Isaac layout)."""
        return jnp.stack([self.q, self.qd], axis=-1)

    @property
    def rigid_body_state(self) -> jnp.ndarray:
        """(...,B,13)."""
        return jnp.concatenate(
            [self.body_pos, self.body_quat, self.body_linvel, self.body_angvel],
            axis=-1,
        )

    def with_root_state(self, root_state: jnp.ndarray) -> "SimState":
        return self._replace(
            root_pos=root_state[..., 0:3],
            root_quat=root_state[..., 3:7],
            root_linvel=root_state[..., 7:10],
            root_angvel=root_state[..., 10:13],
        )

    def with_dof_state(self, dof_state: jnp.ndarray) -> "SimState":
        return self._replace(q=dof_state[..., 0], qd=dof_state[..., 1])


class ModelParams(NamedTuple):
    """Per-env-randomizable physical parameters (domain randomization).

    The reference randomizes mass / friction / size once per *process*
    (`isaacgym_wrapper.py:450-482`, `isaacgym_utils.py:30-52`); keeping these in
    a pytree lets every env draw its own — strictly more capable.
    """

    body_mass_scale: jnp.ndarray    # (B,)
    geom_friction: jnp.ndarray      # (G,)

    @staticmethod
    def default(nbody: int, ngeom: int, geom_friction) -> "ModelParams":
        return ModelParams(
            body_mass_scale=jnp.ones(nbody),
            geom_friction=jnp.asarray(geom_friction),
        )
