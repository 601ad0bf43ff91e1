"""SimView — the ONE stable state-access API for objectives/priors/tests.

The reference grew three incompatible getter surfaces (underscore-private
fields, named getters, and legacy `sim.dof_state` attribute access — API-drift
bugs catalogued in SURVEY §2.5). Here a single view object wraps
(scene, batched SimState) and serves them all; every accessor returns
K-batched arrays ready for vectorized cost math (parity surface:
`isaacgym_wrapper.py:298-356` getters + raw tensors 186-199).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..physics.scene_model import SceneModel
from ..physics.types import SimState
from ..scene.builder import BuiltScene


class SimView:
    def __init__(self, built: BuiltScene, state: SimState):
        self.built = built
        self.scene: SceneModel = built.scene
        self.state = state

    # ---- raw tensors (reference gymtorch-view layout) ----
    @property
    def root_state(self) -> jnp.ndarray:           # (K,A,13)
        return self.state.root_state

    @property
    def dof_state(self) -> jnp.ndarray:            # (K,D,2)
        return self.state.dof_state

    @property
    def rigid_body_state(self) -> jnp.ndarray:     # (K,B,13)
        return self.state.rigid_body_state

    @property
    def net_cf(self) -> jnp.ndarray:               # (K,B,3)
        return self.state.net_contact_force

    @property
    def num_bodies(self) -> int:
        return self.scene.nbody

    # ---- named actor getters ----
    def _ai(self, name: str) -> int:
        return self.scene.actor_index(name)

    def actor_position(self, name: str) -> jnp.ndarray:       # (K,3)
        return self.state.root_pos[..., self._ai(name), :]

    def actor_orientation(self, name: str) -> jnp.ndarray:    # (K,4) xyzw
        return self.state.root_quat[..., self._ai(name), :]

    def actor_linvel(self, name: str) -> jnp.ndarray:
        return self.state.root_linvel[..., self._ai(name), :]

    def actor_angvel(self, name: str) -> jnp.ndarray:
        return self.state.root_angvel[..., self._ai(name), :]

    # reference-style aliases (`get_actor_position_by_name` etc.)
    get_actor_position_by_name = actor_position
    get_actor_orientation_by_name = actor_orientation
    get_actor_velocity_by_name = actor_linvel

    # ---- link / rigid-body getters ----
    def link_position(self, link: str, actor: Optional[str] = None) -> jnp.ndarray:
        return self.state.body_pos[..., self.scene.body_index(link, actor), :]

    def link_orientation(self, link: str, actor: Optional[str] = None) -> jnp.ndarray:
        return self.state.body_quat[..., self.scene.body_index(link, actor), :]

    def link_velocity(self, link: str, actor: Optional[str] = None) -> jnp.ndarray:
        return self.state.body_linvel[..., self.scene.body_index(link, actor), :]

    def link_state(self, link: str, actor: Optional[str] = None) -> jnp.ndarray:
        """(K,13) rigid-body state of a link (the reference's
        `get_actor_link_by_name` returns pose+vel rows)."""
        b = self.scene.body_index(link, actor)
        return self.state.rigid_body_state[..., b, :]

    def get_actor_link_by_name(self, actor: str, link: str) -> jnp.ndarray:
        """Reference argument order: (actor_name, link_name) → (K,13)."""
        return self.link_state(link, actor)

    def get_dof_state(self) -> jnp.ndarray:
        """(K, 2·D) interleaved flat dof state (legacy objective surface)."""
        ds = self.state.dof_state
        return ds.reshape(ds.shape[:-2] + (-1,))

    # ---- contact forces ----
    def actor_contact_forces(self, name: str) -> jnp.ndarray:  # (K, nb_actor, 3)
        ai = self._ai(name)
        o = self.scene.body_offset[ai]
        return self.state.net_contact_force[..., o : o + self.scene.actors[ai].nbody, :]

    def link_contact_force(self, link: str, actor: Optional[str] = None) -> jnp.ndarray:
        return self.state.net_contact_force[..., self.scene.body_index(link, actor), :]

    def get_actor_contact_forces_by_name(self, actor_name: str, link_name: str = None) -> jnp.ndarray:
        """(K,3) net contact force. Reference passes a link name ('box' for
        primitive actors); primitives here are single-body, so the actor's
        root body force is returned when the link isn't found."""
        try:
            if link_name is not None:
                return self.link_contact_force(link_name, actor_name)
        except KeyError:
            pass
        ai = self._ai(actor_name)
        return self.state.net_contact_force[..., self.scene.body_offset[ai], :]

    # ---- DOF access per actor ----
    def actor_q(self, name: str) -> jnp.ndarray:
        return self.state.q[..., self.scene.actor_dof_slice(name)]

    def actor_qd(self, name: str) -> jnp.ndarray:
        return self.state.qd[..., self.scene.actor_dof_slice(name)]

    # ---- robot shorthand (single-robot scenes) ----
    @property
    def robot_name(self) -> str:
        return self.built.robot_names[0]

    def ee_position(self) -> jnp.ndarray:
        """Position of the first visualize_link (the reference's EE-visualization
        body, `isaacgym_wrapper.py:201-212`)."""
        b = self.built.visualize_bodies[0]
        return self.state.body_pos[..., b, :]
