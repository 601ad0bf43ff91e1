"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run hermetically (SURVEY §4 lesson; the axon TPU platform is
session-global otherwise). A persistent compilation cache keeps repeat runs
fast — XLA:CPU compiles the vmapped physics step slowly the first time."""
import os

import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# cache dir: use the package's host-CPU + plugin fingerprinted location
# (mppiisaac_tpu.__init__). A fixed shared dir here mixed axon-remote-compiled
# XLA:CPU AOT artifacts (foreign ISA) into plugin-free runs → segfault on
# warm reload (r5).
import mppiisaac_tpu  # noqa: F401  (configures jax_compilation_cache_dir)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy compile-time tests (full task suite); run with -m slow"
    )
    # The full suite compiles hundreds of XLA:CPU programs in one process;
    # their code mappings grow /proc/<pid>/maps by ~3k entries/min while RSS
    # stays flat, and the kernel default vm.max_map_count=65530 is reached
    # right around the 69th test — mmap then fails inside a pjit execute and
    # the process dies with SIGSEGV/SIGABRT (r5: the "red suite" was this,
    # not a physics failure). Raise the limit when we can (CI images run
    # root); harmless no-op otherwise.
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            cur = int(fh.read().strip())
        if cur < 1_000_000:
            with open("/proc/sys/vm/max_map_count", "w") as fh:
                fh.write("1048576\n")
    except (OSError, PermissionError, ValueError):
        pass


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop compiled-program references at module boundaries: bounds the
    process's live executable mappings (see pytest_configure note); the
    persistent compile cache makes any recompile a fast disk reload."""
    yield
    jax.clear_caches()
