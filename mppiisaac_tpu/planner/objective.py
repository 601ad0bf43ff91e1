"""Objective base class. Task objectives are pure functions of a SimView
returning K-batched costs (parity: reference objectives'
`compute_cost(sim) → (K,)`, e.g. `examples/panda/planner.py:22-40`)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .observables import SimView


class Objective:
    """Subclass and implement compute_cost(view) → (K,) jnp array.

    `weights` is a plain dict consumed inside compute_cost — updating it
    (online tuning RPC `update_weights`, `mppi_isaac.py:126-127`) triggers a
    retrace on next command.
    """

    weights: Dict[str, float] = {}

    def compute_cost(self, view: SimView) -> jnp.ndarray:
        raise NotImplementedError

    def reset(self):
        pass
