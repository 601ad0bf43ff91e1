"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run hermetically (SURVEY §4 lesson; the axon TPU platform is
session-global otherwise). A persistent compilation cache keeps repeat runs
fast — XLA:CPU compiles the vmapped physics step slowly the first time."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy compile-time tests (full task suite); run with -m slow"
    )
