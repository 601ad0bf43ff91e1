"""mppiisaac_tpu — TPU-native sampling-based MPC (MPPI) framework with a
from-scratch pure-JAX rigid-body physics engine.

Capability parity target: tud-airlab/mppi-isaac (see SURVEY.md / DESIGN.md).
"""

__version__ = "0.1.0"
