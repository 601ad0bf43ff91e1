"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run hermetically (SURVEY §4 lesson; the axon TPU platform is
session-global otherwise)."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
