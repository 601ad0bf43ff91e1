"""mppiisaac_tpu — TPU-native sampling-based MPC (MPPI) framework with a
from-scratch pure-JAX rigid-body physics engine.

Capability parity target: tud-airlab/mppi-isaac (see SURVEY.md / DESIGN.md).
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache():
    """Reuse XLA compiles across processes (fused Pallas kernels take minutes
    to compile cold; the reference pays an analogous PhysX warmup once per
    process). Override the location with MPPIISAAC_TPU_CACHE; disable with
    MPPIISAAC_TPU_CACHE=0."""
    loc = _os.environ.get("MPPIISAAC_TPU_CACHE")
    if loc == "0":
        return
    if not loc:
        # fingerprint the cache dir by host CPU: XLA:CPU AOT artifacts bake in
        # the compile machine's ISA features, and jax RELOADS mismatched
        # entries with only a warning ("could lead to SIGILL") — a cache dir
        # shared across heterogeneous hosts (driver vs build container) is
        # silently poisonous. TPU entries are keyed by device target already,
        # but live in the same dir, so fingerprint the whole thing.
        try:
            import hashlib

            flags = ""
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        flags = " ".join(sorted(line.split(":")[1].split()))
                        break
            # the axon plugin remote-compiles (PALLAS_AXON_REMOTE_COMPILE) on
            # a server whose CPU ISA differs from this host; XLA:CPU AOT
            # artifacts it writes SEGFAULT when reloaded by a plugin-free
            # local run (r5: warm `pytest` rerun crashed at test 68). Keep
            # plugin-on and plugin-free caches apart.
            import sys as _sys

            axon = any("axon" in (p or "") for p in _sys.path)
            fp = hashlib.sha1(flags.encode()).hexdigest()[:10] + (
                "-axon" if axon else "-local"
            )
        except Exception:
            fp = "generic"
        loc = _os.path.join(
            _os.path.expanduser("~"), ".cache", "mppiisaac_tpu", f"jax-{fp}"
        )
    try:
        import jax

        _os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        # threshold 0: on tunneled backends (axon) XLA compilation is deferred
        # to the remote server, so the LOCALLY measured compile time is ~0-1 s
        # even for minutes-long compiles — any positive threshold silently
        # filters out every write (round-2 warmup regression)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
